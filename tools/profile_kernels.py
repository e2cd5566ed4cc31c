"""Micro-profile of every pipeline kernel/stage at bench shapes.

Times each jitted piece standalone (steady state, vmapped over the bench
batch) so the 105 ms pipeline wall can be attributed kernel by kernel.
Run on the real chip:  python tools/profile_kernels.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from pyimsegm_tpu.ops import slic as slic_ops
from pyimsegm_tpu.ops import grid as grid_ops

B, H, W = 13, 884, 1200
SP, REG = 35, 0.2


def _fetch(out):
    """Force real device sync: on the axon tunnel platform
    ``block_until_ready`` returns before execution finishes — only a host
    fetch of result bytes actually waits for the queue to drain."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def t(fn, *args, reps=10):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    if '--noise' in sys.argv:
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
    else:
        import bench
        images = jnp.asarray(bench._load_images())
    cfg = slic_ops.slic_config(H, W, SP)
    m = slic_ops.compactness_from_regul(SP, REG)
    print('cfg:', cfg, 'K =', cfg.n_segments, flush=True)

    from pyimsegm_tpu.ops.slic_pallas import (
        slic_multi_update_pallas, slic_assign_pallas,
        slic_update_labels_pallas, combine_sums)
    from pyimsegm_tpu.ops.connectivity_pallas import reach_absorb_pallas
    from pyimsegm_tpu.ops.grid_pallas import (
        grid_reduce_pallas, grid_lookup_pallas, grid_adjacency_presence_pallas)

    # ---- shared prep
    @jax.jit
    def prep(images):
        def f(im):
            lab_p, _v, c0 = slic_ops._prepare_padded(im, cfg)
            return jnp.transpose(lab_p, (2, 0, 1)).astype(jnp.bfloat16), c0
        return jax.vmap(f)(images)

    lab_chw, c0 = jax.block_until_ready(prep(images))
    sw2 = jnp.float32((m / cfg.step) ** 2)
    print('%-34s %8.2f ms' % ('prep (blur+lab+pad)', t(prep, images)), flush=True)

    # ---- SLIC kernels
    for n in (1, 3, 9):
        fn = jax.jit(jax.vmap(
            lambda l, c: slic_multi_update_pallas(l, c, sw2, cfg, n_upd=n)))
        print('%-34s %8.2f ms' % ('multi_update n=%d' % n, t(fn, lab_chw, c0)),
              flush=True)

    centers = jax.block_until_ready(jax.jit(jax.vmap(
        lambda l, c: slic_multi_update_pallas(l, c, sw2, cfg, n_upd=9)))(
        lab_chw, c0))

    assign = jax.jit(jax.vmap(lambda l, c: slic_assign_pallas(l, c, sw2, cfg)))
    print('%-34s %8.2f ms' % ('final assign', t(assign, lab_chw, centers)),
          flush=True)

    feat_chw = jnp.asarray(jnp.transpose(
        jnp.pad(images, [(0, 0), (0, cfg.pad_h - H), (0, cfg.pad_w - W), (0, 0)]),
        (0, 3, 1, 2)), jnp.float32)
    fused = jax.jit(jax.vmap(
        lambda l, c, f: slic_update_labels_pallas(l, c, sw2, cfg, feat_chw=f)))
    print('%-34s %8.2f ms' % ('final fused labels+partials+feat',
                              t(fused, lab_chw, centers, feat_chw)), flush=True)

    labels_pad, partials = jax.block_until_ready(
        fused(lab_chw, centers, feat_chw))
    labels = labels_pad[:, :H, :W]
    sums = jax.vmap(combine_sums)(partials)
    cent_raw = np.asarray(
        sums[..., 3:5] / np.maximum(sums[..., 5:6], 1.0)).reshape(B, -1, 2)
    cent_raw = jnp.asarray(cent_raw)

    # ---- fused single-launch enforcement (seed+reach+absorb, default path)
    from pyimsegm_tpu.ops.enforce_pallas import enforce_fused_pallas, fused_fits

    if fused_fits(cfg):
        @jax.jit
        def enforce_fused(labels, cyx):
            def f(lb, c):
                lb_p = grid_ops._pad_to_grid(lb, cfg, fill=-9)
                return enforce_fused_pallas(lb_p, c, cfg)[:H, :W]
            return jax.vmap(f)(labels, cyx)

        print('%-34s %8.2f ms' % ('enforce fused (seed+reach+absorb)',
                                  t(enforce_fused, labels, cent_raw)),
              flush=True)

    # ---- anchor block (XLA): d2 + segment-min + reached0
    @jax.jit
    def anchor(labels, cyx):
        def f(lb, c):
            h, w = lb.shape
            py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            cpix = grid_ops.grid_lookup(c, lb, cfg)
            d2 = (py - cpix[..., 0]) ** 2 + (px - cpix[..., 1]) ** 2
            d2min = grid_ops.grid_segment_min(d2, lb, cfg)
            return d2 <= grid_ops.grid_lookup(d2min, lb, cfg) + 1e-3
        return jax.vmap(f)(labels, cyx)

    print('%-34s %8.2f ms' % ('anchor (d2+segmin+reached0)',
                              t(anchor, labels, cent_raw)), flush=True)
    reached0 = jax.block_until_ready(anchor(labels, cent_raw))

    # ---- reach+absorb banded kernels
    @jax.jit
    def conn(labels, reached0):
        def f(lb, r0):
            lb_p = grid_ops._pad_to_grid(lb, cfg, fill=-9)
            r_p = grid_ops._pad_to_grid(r0, cfg, fill=False)
            return reach_absorb_pallas(lb_p, r_p, cfg)[:H, :W]
        return jax.vmap(f)(labels, reached0)

    print('%-34s %8.2f ms' % ('reach+absorb (banded pallas)',
                              t(conn, labels, reached0)), flush=True)
    labels_c = jax.block_until_ready(conn(labels, reached0))

    # ---- min-size merge parts
    @jax.jit
    def counts_only(labels):
        return jax.vmap(lambda lb: grid_ops.grid_segment_sum(
            jnp.ones((H, W, 1), jnp.float32), lb, cfg)[:, 0])(labels)

    print('%-34s %8.2f ms' % ('min-size: counts',
                              t(counts_only, labels_c)), flush=True)

    @jax.jit
    def paircnt(labels):
        return jax.vmap(lambda lb: grid_ops.grid_pair_count_channels(lb, cfg))(labels)

    print('%-34s %8.2f ms' % ('min-size: pair-count einsum (XLA)',
                              t(paircnt, labels_c)), flush=True)

    min_size = int(0.5 * cfg.step * cfg.step)

    @jax.jit
    def minsize_full(labels):
        return jax.vmap(
            lambda lb: grid_ops.min_size_merge(lb, cfg, min_size))(labels)

    print('%-34s %8.2f ms' % ('min-size: full merge',
                              t(minsize_full, labels_c)), flush=True)
    labels_m = jax.block_until_ready(minsize_full(labels_c))

    # ---- re-reduce geometry+moments (9 channels)
    @jax.jit
    def rereduce(labels, images):
        def f(lb, im):
            h, w = lb.shape
            data = jnp.concatenate(
                [im, im * im, jnp.ones((h, w, 1), jnp.float32),
                 jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[..., None],
                 jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[..., None]],
                axis=-1)
            return grid_ops.grid_segment_sum(data, lb, cfg)
        return jax.vmap(f)(labels, images)

    print('%-34s %8.2f ms' % ('re-reduce 9ch (pallas reduce)',
                              t(rereduce, labels_m, images)), flush=True)

    @jax.jit
    def moments(labels, images):
        return jax.vmap(lambda lb, im: grid_ops.grid_geometry_moments(
            im, lb, cfg))(labels, images)

    print('%-34s %8.2f ms' % ('re-reduce 9ch (moments kernel)',
                              t(moments, labels_m, images)), flush=True)

    # ---- adjacency presence + MRF + lookups
    @jax.jit
    def adjacency(labels):
        return jax.vmap(lambda lb: grid_ops.grid_adjacency(lb, cfg))(labels)

    print('%-34s %8.2f ms' % ('grid_adjacency (pallas presence)',
                              t(adjacency, labels_m)), flush=True)

    from pyimsegm_tpu.ops import graphcut
    feats = jax.block_until_ready(rereduce(labels_m, images))
    k = cfg.n_segments
    proba = jax.nn.softmax(jnp.stack(
        [feats[:, :, 0], feats[:, :, 1], feats[:, :, 2]], -1), -1)

    @jax.jit
    def mrf(labels, proba, images, feats):
        def f(lb, pr, im, ft):
            return graphcut.segment_graph_cut_general(
                lb, pr, k, image=im, features=ft[:, :6], gc_regul=2.0,
                edge_type='model', grid_ctx=(lb, cfg))
        return jax.vmap(f)(labels, proba, images, feats)

    print('%-34s %8.2f ms' % ('MRF stage (edges+solve)',
                              t(mrf, labels_m, proba, images, feats)), flush=True)

    @jax.jit
    def lookups(labels, proba):
        def f(lb, pr):
            soft = grid_ops.grid_lookup(pr, lb, cfg)
            hard = grid_ops.grid_lookup(
                jnp.argmax(pr, -1).astype(jnp.int32), lb, cfg)
            return soft, hard
        return jax.vmap(f)(labels, proba)

    print('%-34s %8.2f ms' % ('final lookups (soft+hard)',
                              t(lookups, labels_m, proba)), flush=True)


if __name__ == '__main__':
    main()
