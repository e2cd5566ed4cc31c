"""End-to-end throughput benchmark on one chip.

Measures the reference's "batched throughput" config (BASELINE.json configs[2]):
the unsupervised pipeline (SLIC + color features + class-model proba + MRF
regularisation) vmapped across the bundled ``langerhans_islets`` +
``histology_CIMA`` images with a fixed superpixel grid, against the
50 MPix/s/chip target (BASELINE.json:5).  The group model is fitted once
(``estim_model_classes_group`` semantics); steady-state throughput is wall
clock over repeated batches with device pipelining.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import glob
import json
import os
import sys
import time

import numpy as np

TARGET_MPIX_S = 50.0
DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
CROP = (884, 1200)  # common crop across both folders
SP_SIZE, SP_REGUL, GC_REGUL, NB_CLASSES = 35, 0.2, 2.0, 3


def _load_images():
    from PIL import Image
    paths = (sorted(glob.glob(os.path.join(DATA, 'langerhans_islets', 'image', '*.jpg')))
             + sorted(glob.glob(os.path.join(DATA, 'histology_CIMA', '*.jpg'))))
    imgs = []
    for p in paths:
        arr = np.asarray(Image.open(p), dtype=np.float32) / 255.0
        h, w = arr.shape[:2]
        if h < CROP[0] or w < CROP[1] or arr.ndim != 3:
            continue
        y0, x0 = (h - CROP[0]) // 2, (w - CROP[1]) // 2
        imgs.append(arr[y0:y0 + CROP[0], x0:x0 + CROP[1], :3])
    if not imgs:  # synthetic fallback
        rng = np.random.default_rng(0)
        imgs = [rng.random(CROP + (3,), dtype=np.float32) for _ in range(8)]
    return np.stack(imgs)


def _enable_compile_cache():
    """Persistent XLA compile cache: the Mosaic kernels at bench scale cost
    minutes to compile; the cache makes repeat runs start in seconds."""
    import jax
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               os.path.expanduser('~/.cache/jax_bench'))
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()

    from pyimsegm_tpu.models.class_model import estim_class_model
    from pyimsegm_tpu.parallel.batch import _segment_batch_jit
    from pyimsegm_tpu.pipelines import _slic_features_core, _features_spec
    from pyimsegm_tpu.ops import slic as slic_ops

    images = jnp.asarray(_load_images())
    b, h, w = images.shape[:3]
    cfg = slic_ops.slic_config(h, w, SP_SIZE)
    m = slic_ops.compactness_from_regul(SP_SIZE, SP_REGUL)
    spec = _features_spec({'color': ('mean', 'std', 'energy')})

    # group model: SLIC+features per image, one GMM over the pool
    feats, masks = [], []
    for i in range(b):
        _lb, f, c, _cent = _slic_features_core(images[i], cfg, spec, m)
        feats.append(f)
        masks.append((c > 0).astype(jnp.float32))
    model = estim_class_model(jnp.nan_to_num(jnp.concatenate(feats)), NB_CLASSES,
                              'GMM', sample_weight=jnp.concatenate(masks))

    def run():
        return _segment_batch_jit(
            images, model, cfg=cfg, feats_spec=spec, gc_regul=GC_REGUL,
            gc_edge_type='model', compactness=m)

    jax.block_until_ready(run())  # compile
    reps = 5
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    mpix_s = b * h * w * reps / dt / 1e6

    if '--stages' in sys.argv:
        from pyimsegm_tpu.utils.profiling import pipeline_stage_profile
        for name, total, delta in pipeline_stage_profile(
                images, model, cfg, spec, m, gc_regul=GC_REGUL):
            print('# stage %-15s total %7.2f ms   delta %+7.2f ms'
                  % (name, total * 1e3, delta * 1e3), file=sys.stderr)

    print(json.dumps({
        'metric': 'e2e_unsup_batched_throughput',
        'value': round(mpix_s, 3),
        'unit': 'MPix/s/chip',
        'vs_baseline': round(mpix_s / TARGET_MPIX_S, 4),
    }))


if __name__ == '__main__':
    main()
