"""Stage-level attribution for BASELINE config 2 (supervised texture predict).

Times each stage of ``segment_color2d_slic_features_model_graphcut`` with
``{'color','tGabor','tLBP'}`` features on a drosophila_disc image, isolating:
SLIC+enforce, background subtraction, Gabor bank conv, per-battery segment
reductions, LBP codes+hists, classifier predict_proba, graphcut solve, and the
host label gather.  Run on the real chip: ``python tools/profile_cfg2.py``.
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
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from pyimsegm_tpu import descriptors, pipelines
    from pyimsegm_tpu.ops import filters as filter_ops
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops import segment_stats

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
    print('slic+features core (jit, full): %8.2f ms' % ms)

    # color-only core for comparison
    spec_c = pipelines._features_spec({'color': ('mean', 'std', 'energy')})
    ms, _ = timeit(lambda: pipelines._slic_features_core(image, cfg, spec_c, m))
    print('slic+features core (color only): %6.2f ms' % ms)

    img_f = jnp.asarray(image, jnp.float32)
    seg_ids = labels.ravel()
    k = cfg.n_segments
    grid_ctx = (labels, cfg)

    # stage: background subtraction
    bg = jax.jit(lambda x: filter_ops.subtract_background(x, sigma=150.0))
    ms, img_bg = timeit(lambda: bg(img_f))
    print('subtract_background:            %8.2f ms' % ms)

    # stage: gabor conv (bank response incl. battery norm epilogues)
    bank = descriptors._get_gabor_bank()
    fr = jax.jit(lambda x: filter_ops.filter_bank_response(x, bank))
    ms, responses = timeit(lambda: fr(img_bg))
    print('gabor bank response (conv+norm):%8.2f ms   resp %s' % (ms, responses.shape))

    # stage: per-battery segment reductions (as the dispatcher does them)
    def reduce_all():
        outs = []
        for bi in range(len(bank.names)):
            outs.append(segment_stats.compute_channel_statistics(
                responses[bi], seg_ids, k, ('mean', 'energy'), grid_ctx=grid_ctx))
        return jnp.concatenate(outs, -1)
    ms, _ = timeit(lambda: jax.jit(reduce_all)())
    print('gabor per-battery reduce x%d:    %8.2f ms' % (len(bank.names), ms))

    # stage: batched reduction (all batteries stacked into one reduce)
    def reduce_batched():
        stacked = jnp.moveaxis(responses, 0, -2).reshape(
            responses.shape[1], responses.shape[2], -1)
        return segment_stats.compute_channel_statistics(
            stacked, seg_ids, k, ('mean', 'energy'), grid_ctx=grid_ctx)
    ms, _ = timeit(lambda: jax.jit(reduce_batched)())
    print('gabor batched reduce (1 pass):  %8.2f ms' % ms)

    # stage: LBP
    lbp = jax.jit(lambda x: filter_ops.lbp_histogram_features(
        x, seg_ids, k, grid_ctx=grid_ctx)[0])
    ms, _ = timeit(lambda: lbp(img_f))
    print('lbp hists:                      %8.2f ms' % ms)

    # classifier predict on host-ish path
    from pyimsegm_tpu import classification
    feats_np = np.nan_to_num(np.asarray(features))
    y = np.random.default_rng(0).integers(0, 3, feats_np.shape[0])
    clf, _ = classification.create_classif_search_train_export(
        'RandForest', feats_np, y, nb_search_iter=1, cross_val=3, seed=0)
    t0 = time.perf_counter()
    for _ in range(5):
        proba = clf.predict_proba(feats_np)
    print('classif predict_proba:          %8.2f ms' % ((time.perf_counter() - t0) / 5 * 1e3))

    # graphcut
    from pyimsegm_tpu.ops import graphcut
    probaj = jnp.asarray(proba, jnp.float32)
    def gc():
        return graphcut.segment_graph_cut_general(
            labels, probaj, k, image=img_f, features=features,
            gc_regul=5.0, edge_type='model', grid_ctx=grid_ctx, centers=centers)
    ms, graph_labels = timeit(gc)
    print('graphcut solve:                 %8.2f ms' % ms)

    # host gather
    t0 = time.perf_counter()
    for _ in range(5):
        labels_np = np.asarray(labels)
        segm = np.asarray(graph_labels)[labels_np]
        soft = proba[labels_np]
    print('host fetch+gather:              %8.2f ms' % ((time.perf_counter() - t0) / 5 * 1e3))

    # whole predict wall for reference
    def run():
        return pipelines.segment_color2d_slic_features_model_graphcut(
            img_np, clf, feats, sp_size=sp_size, sp_regul=sp_regul,
            gc_regul=5.0, gc_edge_type='model')[0]
    run()
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    print('TOTAL predict wall:             %8.2f ms' % ((time.perf_counter() - t0) / 3 * 1e3))


if __name__ == '__main__':
    main()
