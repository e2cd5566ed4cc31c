"""Stage-level attribution for BASELINE config 2 (supervised texture predict).

Times each stage of the fused supervised predict path with
``{'color','tGabor','tLBP'}`` features on a drosophila_disc image.
Run on the real chip: ``python tools/profile_cfg2.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from PIL import Image

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')


def timeit(fn, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from pyimsegm_tpu import descriptors, pipelines
    from pyimsegm_tpu.ops import filters as filter_ops
    from pyimsegm_tpu.ops import slic as slic_ops

    img_np = np.asarray(Image.open(os.path.join(
        DATA, 'drosophila_disc', 'image', 'img_12.jpg')))
    image = jnp.asarray(img_np)
    sp_size, sp_regul = 35, 0.2
    cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    feats = {'color': ('mean', 'std', 'energy'),
             'tGabor': ('mean', 'energy'), 'tLBP': ('mean',)}
    spec = pipelines._features_spec(feats)

    # full jitted slic+features core
    ms, out = timeit(lambda: pipelines._slic_features_core(image, cfg, spec, m))
    labels, features, counts, centers = out
    print('slic+features core (jit, full): %8.2f ms' % ms, flush=True)

    spec_c = pipelines._features_spec({'color': ('mean', 'std', 'energy')})
    ms, _ = timeit(lambda: pipelines._slic_features_core(image, cfg, spec_c, m))
    print('slic+features core (color only): %6.2f ms' % ms, flush=True)

    img_f = jnp.asarray(image, jnp.float32)
    seg_ids = labels.ravel()
    k = cfg.n_segments
    grid_ctx = (labels, cfg)

    bg = jax.jit(lambda x: filter_ops.subtract_background(x, sigma=150.0))
    ms, img_bg = timeit(lambda: bg(img_f))
    print('subtract_background:            %8.2f ms' % ms, flush=True)

    bank = descriptors._get_gabor_bank()
    fr = jax.jit(lambda x: filter_ops.filter_bank_raw(x, bank))
    ms, raw = timeit(lambda: fr(img_bg))
    print('gabor raw bank (conv+max):      %8.2f ms   resp %s'
          % (ms, raw.shape), flush=True)

    # bf16 conv probe
    import functools
    bank16 = bank._replace(kernels=bank.kernels)  # same kernels; cast inside

    def conv16(x):
        kk = jnp.asarray(bank.kernels[:, ::-1, ::-1], jnp.bfloat16)[:, None]
        pad = bank.kernels.shape[1] // 2
        xx = jnp.moveaxis(x, -1, 0)[:, None].astype(jnp.bfloat16)
        xx = jnp.pad(xx, [(0, 0), (0, 0), (pad, pad), (pad, pad)],
                     mode='symmetric')
        return jax.lax.conv_general_dilated(
            xx, kk, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=jnp.float32)
    ms, _ = timeit(lambda: jax.jit(conv16)(img_bg))
    print('gabor conv bf16 probe:          %8.2f ms' % ms, flush=True)

    # batched texture stats (the new path, stats only, given raw labels)
    tb = jax.jit(lambda im: descriptors._texture_battery_features(
        im, seg_ids, k, ('mean', 'energy'), bank, 'tGabor',
        grid_ctx=grid_ctx)[0])
    ms, _ = timeit(lambda: tb(img_f))
    print('gabor features total (new):     %8.2f ms' % ms, flush=True)

    lbp = jax.jit(lambda x: filter_ops.lbp_histogram_features(
        x, seg_ids, k, grid_ctx=grid_ctx)[0])
    ms, _ = timeit(lambda: lbp(img_f))
    print('lbp hists (new batched):        %8.2f ms' % ms, flush=True)

    # classifier + full fused predict
    from pyimsegm_tpu import classification
    feats_np = np.nan_to_num(np.asarray(features))
    y = np.random.default_rng(0).integers(0, 3, feats_np.shape[0])
    clf, _ = classification.create_classif_search_train_export(
        'RandForest', feats_np, y, nb_search_iter=1, cross_val=3, seed=0)

    def run():
        return pipelines.segment_color2d_slic_features_model_graphcut(
            img_np, clf, feats, sp_size=sp_size, sp_regul=sp_regul,
            gc_regul=5.0, gc_edge_type='model')[0]
    run()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    wall = (time.perf_counter() - t0) / reps * 1e3
    mpix = img_np.shape[0] * img_np.shape[1] / 1e6
    print('TOTAL predict wall:             %8.2f ms  (%.2f MPix/s)'
          % (wall, mpix / wall * 1e3), flush=True)

    # device-only latency of the fused core (excl. host link)
    clf_apply, clf_arrays = clf.device_predict_fn()
    def run_dev():
        return pipelines._segment_with_classif_core(
            image, clf_arrays, clf_apply=clf_apply, cfg=cfg, feats_spec=spec,
            gc_regul=5.0, gc_edge_type='model', compactness=m)
    ms, _ = timeit(lambda: run_dev(), reps=5)
    print('fused core device (incl sync):  %8.2f ms  (%.2f MPix/s)'
          % (ms, mpix / ms * 1e3), flush=True)


if __name__ == '__main__':
    main()
