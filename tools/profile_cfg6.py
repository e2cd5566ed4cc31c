"""Stage attribution for the 3D gray pipeline at bench scale.

Times: supervoxel kernel, counts segment_sum, features, model fit+proba,
graphcut, upsample — to find where the 19.7 s end-to-end wall goes.
Run:  python tools/profile_cfg6.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t(fn, reps=2, warmup=1):
    for _ in range(warmup):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from pyimsegm_tpu import descriptors
    from pyimsegm_tpu.models.class_model import estim_class_model
    from pyimsegm_tpu.ops import graphcut, slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(0)
    z, h, w = 48, 640, 768
    vol = (rng.random((z, h, w), dtype=np.float32) / 2.0)
    vol[:, :, :w // 2] += 0.5
    volj = jnp.asarray(vol)
    cfg = slic3d.slic3d_config(vol.shape, 15, (4, 1, 1))
    m = compactness_from_regul(15, 0.2)
    k = cfg.n_segments
    print('K =', k, flush=True)

    os.environ['PYIMSEGM_SLIC3D_PALLAS'] = '1'
    ms, labels = t(lambda: slic3d.slic3d_segment(volj, cfg, m))
    print('slic3d kernel:        %9.2f ms' % ms, flush=True)
    seg_ids = labels.ravel()

    ms, counts = t(lambda: jax.jit(lambda s: jax.ops.segment_sum(
        jnp.ones_like(s, jnp.float32), s, num_segments=k))(seg_ids))
    print('counts segment_sum:   %9.2f ms' % ms, flush=True)

    feats_fn = jax.jit(lambda v, s: descriptors.compute_selected_features_gray3d(
        v, s, k, {'color': ('mean', 'std', 'energy')})[0])
    ms, features = t(lambda: feats_fn(volj, seg_ids))
    print('features gray3d:      %9.2f ms' % ms, flush=True)

    mask = (counts > 0).astype(jnp.float32)
    fit_fn = jax.jit(lambda f, mk: estim_class_model(
        f, 2, 'GMM', sample_weight=mk))
    ms, model = t(lambda: fit_fn(jnp.nan_to_num(features), mask))
    print('GMM fit:              %9.2f ms' % ms, flush=True)
    proba = model.predict_proba(jnp.nan_to_num(features))

    from pyimsegm_tpu.ops import graph as graph_ops
    adj_fn = jax.jit(lambda lb: graph_ops.adjacency_edges_3d(lb, k))
    ms, (edges, valid) = t(lambda: adj_fn(labels))
    print('adjacency_edges_3d:   %9.2f ms   E_MAX=%d  valid=%d'
          % (ms, edges.shape[0], int(np.asarray(valid).sum())), flush=True)

    w_fn = jax.jit(lambda e, v, pr: graph_ops.edge_model_weights(
        e, v, pr, 'lT'))
    ms, weights = t(lambda: w_fn(edges, valid, proba))
    print('edge_model_weights:   %9.2f ms' % ms, flush=True)

    from pyimsegm_tpu.ops.graphcut import compute_pairwise_cost, solve_mrf
    pw = jnp.asarray(compute_pairwise_cost(0.1, 2), jnp.float32)
    s_fn = jax.jit(lambda u, e, wt: solve_mrf(u, e, wt, pw))
    unary = jax.jit(lambda pr: -jnp.log(jnp.clip(pr, 1e-9, 1.0)))(proba)
    ms, _ = t(lambda: s_fn(unary, edges, weights))
    print('solve_mrf (edges):    %9.2f ms' % ms, flush=True)

    gc_fn = jax.jit(lambda lb, pr, im, ft: graphcut.segment_graph_cut_general(
        lb, pr, k, image=im, features=ft, gc_regul=0.1, edge_type='model'))
    ms, glab = t(lambda: gc_fn(labels, proba, volj, features))
    print('graphcut (generic):   %9.2f ms' % ms, flush=True)

    up_fn = jax.jit(lambda g, lb: g[lb])
    ms, _ = t(lambda: up_fn(glab, labels))
    print('upsample gather:      %9.2f ms' % ms, flush=True)


if __name__ == '__main__':
    main()
