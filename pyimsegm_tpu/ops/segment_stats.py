"""Per-superpixel statistics as XLA segment reductions.

Replaces the reference's OpenMP Cython kernels and numpy fallbacks
(`/root/reference/imsegm/features_cython.pyx:81-218`,
`/root/reference/imsegm/descriptors.py:209-702`) with `segment_sum`
reductions over a statically padded label space of ``num_segments`` bins:

* mean / std (population) / energy are three fused segment-sums over
  ``[x, x**2, 1]`` — one scatter-add pass on device, no races (the Cython 3D
  kernels were racy across z-slices, `descriptors.py:461-463`; segment_sum is
  deterministic).
* median uses a double argsort (sort by value, then stable sort by segment id)
  so ragged per-segment medians become a shape-static gather.
* meanGrad matches the reference definition: the segment mean of
  ``np.gradient(channel)`` summed over axes (`descriptors.py:766-770,841-845`).

Empty segments yield 0 for every statistic (the reference sets counts of -1,
producing 0/−1 = −0 which it renormalises to +0; we produce +0 directly).
"""

import jax
import jax.numpy as jnp


def segment_mean_std_energy(values, seg_ids, num_segments, flags=('mean', 'std', 'energy')):
    """Compute selected moment statistics.

    :param values: (N, C) float32
    :param seg_ids: (N,) int32 in [0, num_segments)
    :param num_segments: static bin count
    :returns: dict of present statistics, each (num_segments, C)
    """
    ones = jnp.ones((values.shape[0], 1), values.dtype)
    data = jnp.concatenate([values, values * values, ones], axis=-1)
    sums = jax.ops.segment_sum(data, seg_ids, num_segments=num_segments)
    c = values.shape[1]
    cnt = sums[:, -1:]
    safe = jnp.maximum(cnt, 1.0)
    mean = sums[:, :c] / safe
    energy = sums[:, c:2 * c] / safe
    out = {}
    if 'mean' in flags:
        out['mean'] = mean
    if 'std' in flags:
        var = jnp.maximum(energy - mean * mean, 0.0)
        out['std'] = jnp.sqrt(var)
    if 'energy' in flags:
        out['energy'] = energy
    return out


def segment_median(values, seg_ids, num_segments):
    """Per-segment median via double argsort (shape-static).

    :param values: (N, C)
    :param seg_ids: (N,)
    :returns: (num_segments, C)
    """
    n = values.shape[0]
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), seg_ids, num_segments=num_segments)
    starts = jnp.cumsum(counts) - counts
    meds = []
    for ch in range(values.shape[1]):
        v = values[:, ch]
        order1 = jnp.argsort(v)
        order2 = jnp.argsort(seg_ids[order1], stable=True)
        perm = order1[order2]
        sv = v[perm]  # grouped by segment, ascending within segment
        lo_idx = starts + jnp.maximum(counts - 1, 0) // 2
        hi_idx = starts + counts // 2
        lo_idx = jnp.clip(lo_idx, 0, n - 1)
        hi_idx = jnp.clip(hi_idx, 0, n - 1)
        med = 0.5 * (sv[lo_idx] + sv[hi_idx])
        meds.append(jnp.where(counts > 0, med, 0.0))
    return jnp.stack(meds, axis=-1)


def image_gradient_sum(channel):
    """``np.sum(np.gradient(ch), axis=0)`` — central differences inside,
    one-sided at the borders, summed over both axes (reference meanGrad,
    `descriptors.py:841-845`)."""
    gy, gx = jnp.gradient(channel)
    return gy + gx


def _reduce_sums(data_hw_f, seg_ids, num_segments, grid_ctx):
    """(K, F) sums of (H, W, F) data — grid path (scatter-free masked tile
    sums, see `pyimsegm_tpu.ops.grid`) when a SLIC grid context is given,
    generic segment_sum otherwise."""
    if grid_ctx is not None:
        from pyimsegm_tpu.ops.grid import grid_segment_sum
        labels2d, cfg = grid_ctx
        return grid_segment_sum(data_hw_f, labels2d, cfg)
    # generic path: promote to f32 — segment_sum accumulates in the input
    # dtype (bf16 one-hot planes would round once sums exceed 256)
    flat = data_hw_f.astype(jnp.float32).reshape(-1, data_hw_f.shape[-1])
    return jax.ops.segment_sum(flat, seg_ids, num_segments=num_segments)


def compute_channel_statistics(image, seg_ids, num_segments, feature_flags,
                               grad_image=None, grid_ctx=None):
    """All selected statistics for an (H, W, C) image over a label map.

    :param image: (H, W, C) float
    :param seg_ids: (H*W,) flat int32 labels
    :param feature_flags: subset of ('mean','std','energy','median','meanGrad')
    :param grad_image: optional precomputed gradient image (H, W, C)
    :param grid_ctx: optional (labels2d, SlicConfig) enabling scatter-free
        reductions for grid-structured labels
    :returns: (num_segments, C * n_flags) features, ordered stat-major like the
        reference (`descriptors.py:826-851`): all channels of 'mean', then all
        of 'std', ...
    """
    h, w, c = image.shape
    image = image.astype(jnp.float32)
    blocks = {}
    moment_flags = tuple(f for f in ('mean', 'std', 'energy') if f in feature_flags)
    if moment_flags:
        ones = jnp.ones((h, w, 1), jnp.float32)
        sums = _reduce_sums(jnp.concatenate([image, image * image, ones], -1),
                            seg_ids, num_segments, grid_ctx)
        cnt = sums[:, -1:]
        safe = jnp.maximum(cnt, 1.0)
        mean = sums[:, :c] / safe
        energy = sums[:, c:2 * c] / safe
        blocks['mean'] = mean
        blocks['std'] = jnp.sqrt(jnp.maximum(energy - mean * mean, 0.0))
        blocks['energy'] = energy
    if 'median' in feature_flags:
        blocks['median'] = segment_median(image.reshape(-1, c), seg_ids,
                                          num_segments)
    if 'meanGrad' in feature_flags:
        if grad_image is None:
            grad_image = jnp.stack(
                [image_gradient_sum(image[..., i]) for i in range(c)], axis=-1)
        ones = jnp.ones((h, w, 1), jnp.float32)
        gsum = _reduce_sums(
            jnp.concatenate([grad_image.astype(jnp.float32), ones], -1),
            seg_ids, num_segments, grid_ctx)
        blocks['meanGrad'] = gsum[:, :c] / jnp.maximum(gsum[:, -1:], 1.0)
    return jnp.concatenate([blocks[f] for f in NAMES_FEATURE_FLAGS
                            if f in feature_flags], axis=-1)


#: canonical ordering of statistic flags (reference `descriptors.py:36`)
NAMES_FEATURE_FLAGS = ('mean', 'std', 'energy', 'median', 'meanGrad')


def statistic_names(ch_names, feature_flags):
    """Feature-name builder matching `descriptors.py:847-851`."""
    return ['%s_%s' % (n, flag) for flag in NAMES_FEATURE_FLAGS
            if flag in feature_flags for n in ch_names]
