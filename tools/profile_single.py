"""Stage attribution for the single-image unsupervised pipeline (config 1).

The BASELINE configs[0] workload — one 1024x647 drosophila ovary slice,
per-image GMM, model edges — is a latency benchmark; this script times the
jitted pipeline prefixes (same method as `utils/profiling.py`) so the
dominant stage is measurable, not guessed.

Usage: ``python tools/profile_single.py [reps]``
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from bench import _enable_compile_cache
    _enable_compile_cache()

    from pyimsegm_tpu.models.class_model import estim_class_model
    from pyimsegm_tpu.ops import graphcut
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.grid import grid_lookup
    from pyimsegm_tpu.pipelines import _features_spec, _slic_features_core
    from pyimsegm_tpu.utils.profiling import profile_prefixes

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    img = jnp.asarray(np.asarray(Image.open(os.path.join(
        DATA, 'drosophila_ovary_slice', 'image', 'insitu7545.jpg'))))
    sp_size, sp_regul, gc_regul, nb_classes = 35, 0.2, 2.0, 3
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    spec = _features_spec({'color': ('mean', 'std', 'energy')})

    def slic_feats(im):
        return _slic_features_core(im, cfg, spec, m)

    def with_fit(im):
        labels, features, counts, centers = slic_feats(im)
        mask = (counts > 0).astype(jnp.float32)
        model = estim_class_model(features, nb_classes, 'GMM',
                                  sample_weight=mask)
        return model

    def with_proba(im):
        labels, features, counts, centers = slic_feats(im)
        mask = (counts > 0).astype(jnp.float32)
        model = estim_class_model(features, nb_classes, 'GMM',
                                  sample_weight=mask)
        return model.predict_proba(features)

    def full(im):
        labels, features, counts, centers = slic_feats(im)
        mask = (counts > 0).astype(jnp.float32)
        model = estim_class_model(features, nb_classes, 'GMM',
                                  sample_weight=mask)
        proba = model.predict_proba(features)
        segm_soft = grid_lookup(proba, labels, cfg)
        graph_labels = graphcut.segment_graph_cut_general(
            labels, proba, cfg.n_segments,
            image=jnp.asarray(im, jnp.float32), features=features,
            gc_regul=gc_regul, edge_type='model',
            grid_ctx=(labels, cfg), centers=centers)
        return grid_lookup(graph_labels, labels, cfg), segm_soft

    rows = profile_prefixes(
        [('slic+enforce+feats', jax.jit(slic_feats)),
         ('gmm_fit', jax.jit(with_fit)),
         ('predict_proba', jax.jit(with_proba)),
         ('mrf+upsample(full)', jax.jit(full))],
        img, reps=reps)
    for name, total, delta in rows:
        print('stage %-20s total %8.2f ms   delta %+8.2f ms'
              % (name, total * 1e3, delta * 1e3))


if __name__ == '__main__':
    main()
