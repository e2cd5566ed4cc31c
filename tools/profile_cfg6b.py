"""Second-pass 3D attribution: the NEW grid-structured pieces."""

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
    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(0)
    z, h, w = 48, 640, 768
    vol = (rng.random((z, h, w), dtype=np.float32) / 2.0)
    vol[:, :, :w // 2] += 0.5
    volj = jnp.asarray(vol)
    cfg = slic3d.slic3d_config(vol.shape, 15, (4, 1, 1))
    m = compactness_from_regul(15, 0.2)
    k = cfg.n_segments

    labels = slic3d.slic3d_segment(volj, cfg, m)
    np.asarray(labels.ravel()[0])

    ms, _ = t(lambda: slic3d.grid3d_segment_sum(
        jnp.ones(labels.shape + (1,), jnp.float32), labels, cfg))
    print('grid3d_segment_sum (F=1): %9.2f ms' % ms, flush=True)

    data3 = jnp.stack([volj, volj * volj, jnp.ones_like(volj)], axis=-1)
    ms, _ = t(lambda: slic3d.grid3d_segment_sum(data3, labels, cfg))
    print('grid3d_segment_sum (F=3): %9.2f ms' % ms, flush=True)

    table = jnp.asarray(rng.random((k, 1), np.float32))
    ms, _ = t(lambda: slic3d.grid3d_lookup(table, labels, cfg))
    print('grid3d_lookup (C=1):      %9.2f ms' % ms, flush=True)

    from pyimsegm_tpu.ops import graph as graph_ops
    edges, valid = graph_ops.adjacency_edges_3d(labels, k)
    weights = jnp.where(valid, 0.5, 0.0)
    ms, wg = t(lambda: slic3d.wgrid3d_from_edges(edges, valid, weights, cfg))
    print('wgrid3d_from_edges:       %9.2f ms' % ms, flush=True)

    unary = jnp.asarray(rng.random((k, 2), np.float32) * 3.0)
    pw = jnp.asarray([[0.0, 0.1], [0.1, 0.0]], jnp.float32)
    ms, _ = t(lambda: slic3d.solve_mrf_grid3d(unary, wg, pw, cfg))
    print('solve_mrf_grid3d:         %9.2f ms' % ms, flush=True)

    spec = pipelines._features_spec({'color': ('mean', 'std', 'energy')})
    core = lambda: pipelines._pipe_gray3d_core(
        volj, cfg=cfg, feats_spec=spec, nb_classes=2, estim_model='GMM',
        gc_regul=0.1, compactness=m)
    ms, _ = t(core)
    print('FULL jitted 3D core:      %9.2f ms' % ms, flush=True)


if __name__ == '__main__':
    main()
