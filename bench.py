"""End-to-end throughput benchmark: SLIC + features + GMM + MRF on one chip.

Runs the full unsupervised pipeline (the reference's north-star config:
`run_segm_slic_model_graphcut.py` params — sp_size 35, sp_regul 0.2,
gc_regul 2.0, edge 'model') on the bundled drosophila ovary image and prints
one JSON line with MPix/s against the 50 MPix/s/chip target
(BASELINE.json:5).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyimsegm_tpu.pipelines import _pipe_unsup_core, _features_spec
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.utils import data_samples

    if data_samples.has_sample_data():
        image = data_samples.load_sample_image()
    else:  # synthetic fallback with similar size
        rng = np.random.default_rng(0)
        image = rng.random((647, 1024, 3), dtype=np.float32)

    h, w = image.shape[:2]
    sp_size, sp_regul = 35, 0.2
    cfg = slic_ops.slic_config(h, w, sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    kwargs = dict(
        cfg=cfg, feats_spec=_features_spec({'color': ('mean', 'std', 'energy')}),
        nb_classes=4, estim_model='GMM', pca_coef=None, use_scaler=True,
        gc_regul=2.0, gc_edge_type='model', compactness=m, seed=0)

    img_dev = jnp.asarray(image, jnp.float32)

    def run():
        out = _pipe_unsup_core(img_dev, **kwargs)
        jax.block_until_ready(out[0])
        return out

    run()  # compile
    # steady-state timing
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    mpix_s = (h * w) / dt / 1e6

    target = 50.0
    print(json.dumps({
        'metric': 'e2e_unsup_pipeline_throughput',
        'value': round(mpix_s, 3),
        'unit': 'MPix/s/chip',
        'vs_baseline': round(mpix_s / target, 4),
    }))


if __name__ == '__main__':
    main()
