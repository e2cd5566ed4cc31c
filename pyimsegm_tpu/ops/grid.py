"""Scatter-free segment reductions for grid-structured SLIC labels.

TPU scatters are slow (~10 ms for a 0.8-MPix ``segment_sum`` on one chip),
and the baseline pipeline performs a dozen of them.  SLIC labels have a
structural guarantee the generic scatter ignores: *every pixel's label is one
of the 9 seed cells around its own tile* (the assignment step only considers
that neighborhood, `pyimsegm_tpu.ops.slic`).  This module exploits it:

* :func:`grid_segment_sum` — per-superpixel sums as 9 masked dense tile
  reductions followed by 9 static grid shifts.  Pure elementwise + reshape
  reductions, fully fusable by XLA; ~10x faster than ``segment_sum``.
* :func:`grid_lookup` — superpixel-table -> pixel-map upsampling as 9 masked
  selects instead of a big gather.

Both fall back transparently when no grid structure is available (arbitrary
label maps still use the generic ops).
"""

import os

import jax
import jax.numpy as jnp

from pyimsegm_tpu.ops.slic import SlicConfig, _upsample_grid

_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _neighbor_id_field(cfg: SlicConfig, di, dj):
    """(pad_h, pad_w) int32 map: id of the (di, dj) grid neighbor of each
    pixel's tile (-1 when out of range)."""
    gh, gw = cfg.grid_h, cfg.grid_w
    ty = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) + di
    tx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) + dj
    inb = (ty >= 0) & (ty < gh) & (tx >= 0) & (tx < gw)
    nb = jnp.where(inb, ty * gw + tx, -1)
    return _upsample_grid(nb[..., None].astype(jnp.float32),
                          cfg.step)[..., 0].astype(jnp.int32)


def _pad_to_grid(arr, cfg: SlicConfig, fill=0):
    ph = cfg.pad_h - arr.shape[0]
    pw = cfg.pad_w - arr.shape[1]
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return jnp.pad(arr, pad, constant_values=fill)


def _shift2d(grid2d, di, dj):
    """Shift a (gh, gw, F) grid so cell (y, x) moves to (y+di, x+dj),
    zero-filling; pure pad+slice."""
    gh, gw = grid2d.shape[:2]
    pad = [(max(di, 0), max(-di, 0)), (max(dj, 0), max(-dj, 0))] \
        + [(0, 0)] * (grid2d.ndim - 2)
    padded = jnp.pad(grid2d, pad)
    return padded[max(-di, 0):max(-di, 0) + gh, max(-dj, 0):max(-dj, 0) + gw]


def grid_segment_sum(data, labels, cfg: SlicConfig):
    """Sum ``data`` into per-superpixel bins without scatters.

    Every pixel's label is one of the 3x3 grid neighbours of its tile, so the
    reduction is one per-tile one-hot einsum on the MXU — a single pass over
    the pixel data (the previous formulation re-read it 9 times) — followed by
    nine tiny (gh, gw) grid shifts to route each offset bin to its seed.

    :param data: (H, W, F) float32 (H, W = cfg.height/width); contributions
        outside the image must already be zeroed by the caller if data was
        padded
    :param labels: (H, W) int32 SLIC labels satisfying the 3x3-tile guarantee
    :param cfg: the SLIC geometry that produced ``labels``
    :returns: (K, F) sums
    """
    from pyimsegm_tpu.ops.slic import _pallas_available
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_reduce_pallas
        return grid_reduce_pallas(data, labels, cfg)
    f = data.shape[-1]
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    data_p = _pad_to_grid(data, cfg)
    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape

    tile_y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) // step
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) // step
    ly = labels_p // gw
    lx = labels_p % gw
    dy = ly - tile_y + 1
    dx = lx - tile_x + 1
    valid = (labels_p >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    off = jnp.where(valid, dy * 3 + dx, 0)
    # bf16 one-hot (exact 0/1): halves the dominant HBM traffic of the
    # materialised routing tensor and feeds the MXU natively
    onehot = jax.nn.one_hot(off, 9, dtype=jnp.bfloat16) \
        * valid[..., None].astype(jnp.bfloat16)

    # per-tile (step*step, 9)^T @ (step*step, F) matmuls on the MXU
    d_t = data_p.reshape(gh, step, gw, step, f).transpose(0, 2, 1, 3, 4) \
        .reshape(gh * gw, step * step, f)
    o_t = onehot.reshape(gh, step, gw, step, 9).transpose(0, 2, 1, 3, 4) \
        .reshape(gh * gw, step * step, 9)
    out9 = jnp.einsum('tpo,tpf->tof', o_t.astype(data_p.dtype), d_t,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    out9 = out9.reshape(gh, gw, 9, f)

    out = jnp.zeros((gh, gw, f), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        out = out + _shift2d(out9[:, :, idx], di, dj)
    return out.reshape(gh * gw, f)


def grid_geometry_moments(feat, labels, cfg: SlicConfig):
    """Per-superpixel geometry + color moments in one measurement.

    :param feat: (H, W, F) float feature image
    :param labels: (H, W) int32 grid-structured labels
    :returns: (K, 2F+3) f32 — ``[sum feat, sum feat^2, count, sum y,
        sum x]`` (the 9 columns the post-enforcement re-reduce in
        `pipelines._slic_features_core` consumes for F=3)

    On TPU this is one Pallas launch that synthesizes the squared/ones/iota
    channels in VMEM (`grid_pallas.grid_moments_pallas`); elsewhere it is
    the portable stacked-channel segment sum.
    """
    from pyimsegm_tpu.ops.slic import _pallas_available
    feat = jnp.asarray(feat, jnp.float32)
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_moments_pallas
        return grid_moments_pallas(feat, labels, cfg)
    h, w = labels.shape
    data = jnp.concatenate(
        [feat, feat * feat, jnp.ones((h, w, 1), jnp.float32),
         jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[..., None],
         jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[..., None]],
        axis=-1)
    return grid_segment_sum(data, labels, cfg)


def grid_lookup(table, labels, cfg: SlicConfig):
    """Per-pixel lookup ``table[labels]`` without a gather.

    Each pixel selects among its tile's 3x3 neighbour seeds: one per-tile
    one-hot einsum against the (9, C) stacked neighbour values — a single
    pass over the pixels.

    :param table: (K,) or (K, C) array
    :param labels: (H, W) int32 grid-structured labels
    :returns: (H, W) or (H, W, C) array
    """
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
    c = table.shape[-1]
    from pyimsegm_tpu.ops.slic import _pallas_available
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_lookup_pallas
        out = grid_lookup_pallas(table, labels, cfg).astype(table.dtype)
        return out[..., 0] if squeeze else out
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    tgrid = table.reshape(gh, gw, c).astype(jnp.float32)
    # (gh, gw, 9, C): value of each 3x3 neighbour seed per tile
    t9 = jnp.stack([_shift2d(tgrid, -di, -dj) for di, dj in _OFFSETS], axis=2)

    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape
    tile_y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) // step
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) // step
    dy = labels_p // gw - tile_y + 1
    dx = labels_p % gw - tile_x + 1
    valid = (labels_p >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    off = jnp.where(valid, dy * 3 + dx, 0)
    onehot = jax.nn.one_hot(off, 9, dtype=jnp.float32) \
        * valid[..., None].astype(jnp.float32)
    o_t = onehot.reshape(gh, step, gw, step, 9).transpose(0, 2, 1, 3, 4) \
        .reshape(gh * gw, step * step, 9)
    out = jnp.einsum('tpo,toc->tpc', o_t, t9.reshape(gh * gw, 9, c),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(gh, gw, step, step, c).transpose(0, 2, 1, 3, 4) \
        .reshape(hp, wp, c)[:cfg.height, :cfg.width]
    out = out.astype(table.dtype)
    return out[..., 0] if squeeze else out


def grid_segment_count(labels, cfg: SlicConfig):
    """(K,) pixel counts per superpixel (scatter-free)."""
    ones = jnp.ones(labels.shape + (1,), jnp.float32)
    return grid_segment_sum(ones, labels, cfg)[:, 0]


def _shift_img(arr, di, dj, fill):
    """Shift an (H, W) image so pixel (y, x) moves to (y+di, x+dj), filling
    vacated cells with ``fill``; pure pad+slice."""
    h, w = arr.shape
    padded = jnp.pad(arr, ((max(di, 0), max(-di, 0)),
                           (max(dj, 0), max(-dj, 0))), constant_values=fill)
    return padded[max(-di, 0):max(-di, 0) + h, max(-dj, 0):max(-dj, 0) + w]


_CONN4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def grid_segment_min(value, labels, cfg: SlicConfig):
    """(K,) per-superpixel minimum of a (H, W) float map, scatter-free:
    nine masked dense tile min-reductions + nine grid shifts (the min analog
    of :func:`grid_segment_sum`; empty superpixels get +inf)."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    value_p = _pad_to_grid(value, cfg, fill=jnp.inf)
    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape
    tile_y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) // step
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) // step
    dy = labels_p // gw - tile_y + 1
    dx = labels_p % gw - tile_x + 1
    valid = (labels_p >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    off = jnp.where(valid, dy * 3 + dx, -1)
    out = jnp.full((gh, gw), jnp.inf, jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        part = jnp.where(off == idx, value_p, jnp.inf) \
            .reshape(gh, step, gw, step).min(axis=(1, 3))
        out = jnp.minimum(out, _shift_img(part, di, dj, jnp.inf))
    return out.reshape(gh * gw)


def _enforce_backend(cfg: SlicConfig):
    """Size-guarded dispatch for :func:`enforce_grid_connectivity`:
    ``'fused'`` (one banded Pallas launch) only when the kernel's band stack
    estimate fits the scoped-VMEM budget, else ``'xla'`` (anchor seed +
    :func:`_connect_components`, which has its own narrower-band guard).
    The round-3 driver bench OOM'd at compile time precisely because this
    guard was missing (VERDICT.md r3)."""
    from pyimsegm_tpu.ops.slic import _pallas_available
    if not _pallas_available():
        return 'xla'
    knob = os.environ.get('PYIMSEGM_ENFORCE_KERNEL', 'auto')
    if knob in ('rafused', 'two', 'xla'):
        return 'xla'      # XLA seed; _connect_components picks the kernel
    from pyimsegm_tpu.ops.enforce_pallas import fused_fits
    return 'fused' if fused_fits(cfg) else 'xla'


def enforce_grid_connectivity(labels, cfg: SlicConfig, min_size=None,
                              centers=None):
    """Make every superpixel a single 4-connected region, on device.

    The reference always runs skimage SLIC with ``enforce_connectivity=True``
    (`/root/reference/imsegm/superpixels.py:61-63`), which merges detached
    fragments into adjacent superpixels.  This is the jit-friendly analog:

    1. *anchor* each superpixel at the pixel nearest its centroid (skipped —
       all its pixels pass as reached — in the rare case the rounded centroid
       falls outside the superpixel, e.g. a crescent shape);
    2. *reach*: iterated 4-neighbour propagation of "connected to my anchor"
       restricted to same-label pixels (``lax.while_loop`` with early exit,
       geodesic-diameter many cheap elementwise steps);
    3. *absorb*: unreached pixels (detached fragments) repeatedly take the
       label of an adjacent reached pixel — but only when that label lies in
       the pixel's own 3x3 seed window, so the grid-structure invariant every
       scatter-free op in this module relies on is preserved by construction
       (a fragment whose surroundings all violate the window keeps its label
       rather than corrupt the grid ops; vanishingly rare);
    4. optionally (``min_size``) *merge whole superpixels* below the skimage
       size floor into a neighbour, with the same absorb scans: skimage kills
       every component smaller than ``min_size_factor * step**2``, and this
       pass reproduces that granularity (without it, tessellations drift on
       high-variance images where many superpixels shrink below the floor).

    Unlike skimage, which *splits* large detached components into brand-new
    superpixels, fragments here are always merged (K is static); with SLIC's
    spatial term large detached fragments do not occur in practice.

    :param labels: (H, W) int32 grid-structured SLIC labels
    :param min_size: merge superpixels with fewer pixels into a neighbour
    :param centers: optional precomputed (K, 2) centroids in (y, x) — e.g.
        the geometry emitted by the fused final SLIC pass — saving one
        full-image segment reduction here
    :returns: (H, W) int32 labels, connected per superpixel
    """
    h, w = labels.shape
    labels = labels.astype(jnp.int32)

    # anchors: the pixel(s) of each superpixel nearest its centroid — the
    # min is taken *within* the superpixel (scatter-free segment-min), so an
    # anchor always exists inside it, even for crescent shapes whose rounded
    # centroid falls outside
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    if centers is None:
        coords = jnp.stack([jnp.ones((h, w), jnp.float32), py, px], axis=-1)
        sums = grid_segment_sum(coords, labels, cfg)
        safe = jnp.maximum(sums[:, 0:1], 1.0)
        cyx = sums[:, 1:3] / safe                   # (K, 2) centroids
    else:
        cyx = jnp.asarray(centers, jnp.float32)

    if _enforce_backend(cfg) == 'fused':
        # one banded launch: anchor seed + reach + absorb all in VMEM
        # (the XLA anchor stage below costs ~14 ms/13 MPix on its own)
        from pyimsegm_tpu.ops.enforce_pallas import enforce_fused_pallas
        labels_p = _pad_to_grid(labels, cfg, fill=-9)
        labels = enforce_fused_pallas(labels_p, cyx, cfg)[:h, :w]
        if min_size:
            labels = min_size_merge(labels, cfg, min_size)
        return labels
    # else: XLA anchor seed + two-launch/XLA reach+absorb (those kernels
    # hold fewer live temporaries, so they band narrower and always fit)

    cpix = grid_lookup(cyx, labels, cfg)            # per-pixel own centroid
    d2 = (py - cpix[..., 0]) ** 2 + (px - cpix[..., 1]) ** 2
    d2min = grid_segment_min(d2, labels, cfg)       # (K,)
    reached0 = d2 <= grid_lookup(d2min, labels, cfg) + 1e-3

    labels = _connect_components(labels, reached0, cfg)
    if min_size:
        labels = min_size_merge(labels, cfg, min_size)
    return labels


def enforce_minsize_with_moments(labels, cfg: SlicConfig, min_size, centers,
                                 feat):
    """Connectivity enforcement + min-size merge + geometry/moments reduce
    with the minimum number of pixel-scale passes.

    Semantically identical to ``enforce_grid_connectivity(..., min_size)``
    followed by ``grid_geometry_moments``, but on TPU the donor application
    and the re-reduce run as ONE fused launch
    (:func:`pyimsegm_tpu.ops.grid_pallas.grid_moments_apply_pallas`), so the
    post-enforcement block is enforce -> measure -> [apply+reduce] instead
    of enforce -> measure -> apply -> reduce.

    :param feat: (H, W, F) float feature image to reduce over the final
        labels
    :returns: (labels (H, W) i32, sums (K, 2F+3) f32)
    """
    from pyimsegm_tpu.ops.slic import _pallas_available
    labels = enforce_grid_connectivity(labels, cfg, min_size=None,
                                       centers=centers)
    if not min_size:
        return labels, grid_geometry_moments(feat, labels, cfg)
    gh, gw = cfg.grid_h, cfg.grid_w
    counts, sym25, counts9 = counts_and_contacts(labels, cfg)
    donor = donor_chain_table(counts, sym25, gh, gw, min_size,
                              counts9=counts9)
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_moments_apply_pallas
        return grid_moments_apply_pallas(feat, labels, donor, cfg)
    h, w = labels.shape
    step = cfg.step
    ty = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // step
    tx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // step
    new = grid_lookup(donor[:, None].astype(jnp.float32), labels,
                      cfg)[..., 0].astype(jnp.int32)
    ok = (jnp.abs(new // gw - ty) <= 1) & (jnp.abs(new % gw - tx) <= 1)
    labels = jnp.where(ok, new, labels)
    return labels, grid_geometry_moments(feat, labels, cfg)


def donor_table_from_counts(counts, sym25, gh, gw, min_size):
    """Per-label merge targets for the min-size phase.

    :param counts: (K,) per-superpixel pixel counts
    :param sym25: (gh, gw, 25) symmetric boundary-contact counts
    :param min_size: the skimage size floor
    :returns: (donor (K,) int32 — target label, or the label itself when it
        is kept / has no kept neighbour this round; small (K,) bool)

    Donor = the *kept* (not-small) grid neighbour with maximum boundary
    contact — skimage's most-contact merge, made sweep-order-independent so
    the batch and sharded pipelines take identical decisions from identical
    replicated tables.
    """
    k = gh * gw
    small = counts < float(min_size)                 # (K,) empties included
    small_g = small.reshape(gh, gw)
    oy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    best_score = jnp.full((gh, gw), -1.0, jnp.float32)
    best_donor = jnp.arange(k, dtype=jnp.int32).reshape(gh, gw)
    for ci, (dy, dx) in enumerate(GRAPH_OFFSETS):
        ny, nx = oy + dy, ox + dx
        valid = (ny >= 0) & (ny < gh) & (nx >= 0) & (nx < gw)
        nyc, nxc = jnp.clip(ny, 0, gh - 1), jnp.clip(nx, 0, gw - 1)
        kept = ~small_g[nyc, nxc] & valid
        score = jnp.where(kept, sym25[..., ci], -1.0)
        take = score > best_score
        best_score = jnp.where(take, score, best_score)
        best_donor = jnp.where(take, nyc * gw + nxc, best_donor)
    donor = jnp.where(small_g & (best_score > 0.0), best_donor,
                      jnp.arange(k, dtype=jnp.int32).reshape(gh, gw))
    return donor.reshape(k), small


def sym_contact_counts(cnt25_directed, gh, gw):
    """Symmetrize directed (gh, gw, 25) boundary-pair counts: contact(A, B)
    = directed(A->B) + directed(B->A) routed back through the flipped
    channel (shared by the batch and sharded min-size merges)."""
    perm = _flip_channel_perm()
    partner = jnp.stack(
        [_shift2d(cnt25_directed[..., perm[ci]], -dy, -dx)
         for ci, (dy, dx) in enumerate(GRAPH_OFFSETS)], axis=-1)
    return cnt25_directed + partner


def grid_pair_count_channels(labels, cfg: SlicConfig):
    """Raw directed (gh, gw, 25) boundary-contact counts (the pre-threshold
    tensor behind :func:`grid_adjacency`); always the XLA einsum path — the
    min-size merge needs counts, not presence."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape
    b_h = jnp.concatenate([labels_p[:, 1:],
                           jnp.full((hp, 1), -2, labels_p.dtype)], 1)
    b_v = jnp.concatenate([labels_p[1:, :],
                           jnp.full((1, wp), -2, labels_p.dtype)], 0)
    cnt9 = (_pair_counts_einsum(labels_p, b_h, cfg)
            + _pair_counts_einsum(labels_p, b_v, cfg))
    adj = jnp.zeros((gh, gw, 25), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        adj = adj + _shift2d(cnt9[:, :, idx], di, dj)
    return adj


def counts_and_contacts(labels, cfg: SlicConfig):
    """Per-superpixel pixel counts + symmetric boundary-contact counts + the
    per-(tile, offset) pixel counts, the measurement triple behind the
    min-size merge — one Pallas launch on TPU
    (`pyimsegm_tpu.ops.grid_pallas.grid_pair_count_pallas`), the one-hot
    einsum + masked tile reduction formulations elsewhere.

    :returns: (counts (K,) f32, sym25 (gh, gw, 25) f32,
        counts9 (gh, gw, 9) f32 pixel counts per tile and routing offset)
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    from pyimsegm_tpu.ops.slic import _pallas_available
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_pair_count_pallas
        cnt9, counts9 = grid_pair_count_pallas(labels, cfg)
        raw25 = jnp.zeros((gh, gw, 25), jnp.float32)
        counts = jnp.zeros((gh, gw), jnp.float32)
        for idx, (di, dj) in enumerate(_OFFSETS):
            raw25 = raw25 + _shift2d(cnt9[:, :, idx], di, dj)
            counts = counts + _shift_img(counts9[:, :, idx], di, dj, 0.0)
        return (counts.reshape(gh * gw), sym_contact_counts(raw25, gh, gw),
                counts9)
    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape
    tile_y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) // step
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) // step
    dy = labels_p // gw - tile_y + 1
    dx = labels_p % gw - tile_x + 1
    valid = (labels_p >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    off = jnp.where(valid, dy * 3 + dx, -1)
    counts9 = jnp.stack(
        [jnp.where(off == oi, 1.0, 0.0)
         .reshape(gh, step, gw, step).sum(axis=(1, 3)) for oi in range(9)],
        axis=-1)
    counts = jnp.zeros((gh, gw), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        counts = counts + _shift_img(counts9[:, :, idx], di, dj, 0.0)
    sym25 = sym_contact_counts(grid_pair_count_channels(labels, cfg), gh, gw)
    return counts.reshape(gh * gw), sym25, counts9


def label_tile_extents(counts9, gh, gw):
    """Per-label extent of the tiles its pixels occupy.

    :param counts9: (gh, gw, 9) pixel counts per tile and routing offset
    :returns: (ty_min, ty_max, tx_min, tx_max), each (K,) int32; empty
        labels get their own grid cell (no constraint).
    """
    oy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    big = jnp.int32(2 ** 20)
    ty_min = jnp.full((gh, gw), big, jnp.int32)
    ty_max = jnp.full((gh, gw), -big, jnp.int32)
    tx_min = jnp.full((gh, gw), big, jnp.int32)
    tx_max = jnp.full((gh, gw), -big, jnp.int32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        # tile (y-di, x-dj) holds pixels of label (y, x) under offset idx
        m = _shift2d(counts9[:, :, idx], di, dj) > 0
        ty_min = jnp.minimum(ty_min, jnp.where(m, oy - di, big))
        ty_max = jnp.maximum(ty_max, jnp.where(m, oy - di, -big))
        tx_min = jnp.minimum(tx_min, jnp.where(m, ox - dj, big))
        tx_max = jnp.maximum(tx_max, jnp.where(m, ox - dj, -big))
    empty = ty_min == big
    ty_min = jnp.where(empty, oy, ty_min).reshape(-1)
    ty_max = jnp.where(empty, oy, ty_max).reshape(-1)
    tx_min = jnp.where(empty, ox, tx_min).reshape(-1)
    tx_max = jnp.where(empty, ox, tx_max).reshape(-1)
    return ty_min, ty_max, tx_min, tx_max


def min_size_merge(labels, cfg: SlicConfig, min_size, n_rounds=3):
    """Merge whole superpixels below ``min_size`` into their max-contact
    kept neighbour (skimage ``min_size_factor`` semantics,
    `skimage/segmentation/_slic.py`), preserving the 3x3 grid invariant:
    pixels whose donor seed falls outside their own 3x3 tile window keep
    their label (vanishingly rare).

    Costs ONE pixel-scale measurement (counts + boundary contacts) and one
    pixel-scale apply; chains of small superpixels whose neighbours are all
    small resolve by pointer-chasing the (K,)-sized donor table
    (:func:`donor_chain_table`) instead of re-measuring the image
    ``n_rounds`` times — the table chase covers ``2**n_rounds`` hops for
    a few K-sized gathers."""
    h, w = labels.shape
    gh, gw = cfg.grid_h, cfg.grid_w
    step = cfg.step
    ty = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) // step
    tx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) // step
    counts, sym25, counts9 = counts_and_contacts(labels, cfg)
    donor = donor_chain_table(counts, sym25, gh, gw, min_size,
                              n_hops=n_rounds, counts9=counts9)
    new = grid_lookup(donor[:, None].astype(jnp.float32), labels,
                      cfg)[..., 0].astype(jnp.int32)
    ok = (jnp.abs(new // gw - ty) <= 1) & (jnp.abs(new % gw - tx) <= 1)
    return jnp.where(ok, new, labels)


def donor_chain_table(counts, sym25, gh, gw, min_size, n_hops=3,
                      counts9=None):
    """Fully-resolved merge targets from a single measurement.

    Extends :func:`donor_table_from_counts` to all-small neighbourhoods: a
    small label with no kept neighbour points at its max-contact *small*
    neighbour that is strictly greater in ``(count, -index)`` order (so the
    pointer graph is acyclic by construction), and the table is squared
    ``n_hops`` times (``d = d[d]``, covering ``2**n_hops``-long chains with
    K-sized gathers).  The chain merge is a different (order-independent,
    single-measurement) approximation of skimage's min-size semantics than
    a round-based re-measuring merge — e.g. some long chains resolve in one
    shot that rounds would need several passes for, and a few below-floor
    labels whose neighbourhood only opens up after other merges survive —
    validated by the re-measured pipeline ARS (QUALITY.md).  A chain that
    never reaches a kept label leaves its members unchanged.

    When ``counts9`` (the (gh, gw, 9) per-tile/offset pixel counts) is
    given, merges are *all-or-nothing per source label*: a chain only fires
    when its terminal lies inside the 3x3 seed window of **every** tile the
    source's pixels occupy, and every intermediate link's chain also fires —
    so a kept label can never absorb a fragment it does not touch (which
    could split it into multiple 4-connected components).

    :returns: (K,) int32 — final kept target per label, or the label itself
    """
    k = gh * gw
    donor, small = donor_table_from_counts(counts, sym25, gh, gw, min_size)
    idx = jnp.arange(k, dtype=jnp.int32)

    # fallback pointers for small labels whose whole neighbourhood is small
    small_g = small.reshape(gh, gw)
    cnt_g = jnp.asarray(counts, jnp.float32).reshape(gh, gw)
    self_g = idx.reshape(gh, gw)
    oy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    best_score = jnp.full((gh, gw), -1.0, jnp.float32)
    best_fb = self_g
    for ci, (dy, dx) in enumerate(GRAPH_OFFSETS):
        ny, nx = oy + dy, ox + dx
        valid = (ny >= 0) & (ny < gh) & (nx >= 0) & (nx < gw)
        nyc, nxc = jnp.clip(ny, 0, gh - 1), jnp.clip(nx, 0, gw - 1)
        nidx = nyc * gw + nxc
        ncnt = cnt_g[nyc, nxc]
        greater = (ncnt > cnt_g) | ((ncnt == cnt_g) & (nidx < self_g))
        cand = small_g[nyc, nxc] & valid & greater
        score = jnp.where(cand, sym25[..., ci], -1.0)
        take = score > best_score
        best_score = jnp.where(take, score, best_score)
        best_fb = jnp.where(take, nidx, best_fb)
    fb = jnp.where(best_score.reshape(k) > 0.0, best_fb.reshape(k), idx)

    d1 = jnp.where(small & (donor == idx), fb, donor)
    d = d1
    for _ in range(max(int(n_hops), 1)):
        d = d[d]
    fire = small & ~small[d]
    if counts9 is not None:
        # all-or-nothing: the terminal must be window-valid for every tile
        # the source's pixels occupy, and every link of the chain must fire
        # too — otherwise a kept label could absorb non-touching fragments
        # and end up 4-disconnected (the chain guarantees contact only
        # link-to-link)
        ty_min, ty_max, tx_min, tx_max = label_tile_extents(counts9, gh, gw)
        dy, dx = d // gw, d % gw
        ok = ((jnp.abs(dy - ty_min) <= 1) & (jnp.abs(dy - ty_max) <= 1)
              & (jnp.abs(dx - tx_min) <= 1) & (jnp.abs(dx - tx_max) <= 1)
              | ~small)
        dd = d1
        for _ in range(max(int(n_hops), 1)):
            ok = ok & ok[dd]
            dd = dd[dd]
        fire = fire & ok
    # only fire merges that terminate on a kept label
    return jnp.where(fire, d, idx)


def _connect_components(labels, reached0, cfg: SlicConfig):
    h, w = labels.shape

    from pyimsegm_tpu.ops.slic import _pallas_available
    if _pallas_available():
        from pyimsegm_tpu.ops.connectivity_pallas import (
            band_fits, fused_ra_fits, reach_absorb_fused_pallas,
            reach_absorb_pallas)
        knob = os.environ.get('PYIMSEGM_ENFORCE_KERNEL', 'auto')
        if fused_ra_fits(cfg) and knob in ('auto', 'rafused'):
            # single-launch banded reach+absorb: the reach plane stays in
            # VMEM (no HBM round-trip, one grid sequencing)
            labels_p = _pad_to_grid(labels, cfg, fill=-9)
            reached_p = _pad_to_grid(reached0, cfg, fill=False)
            return reach_absorb_fused_pallas(labels_p, reached_p, cfg)[:h, :w]
        if band_fits(cfg.step, cfg.pad_w) and knob != 'xla':
            # banded VMEM-resident reach+absorb (same scan algorithm as
            # below, but iterating at vector-memory bandwidth, not HBM)
            labels_p = _pad_to_grid(labels, cfg, fill=-9)
            reached_p = _pad_to_grid(reached0, cfg, fill=False)
            return reach_absorb_pallas(labels_p, reached_p, cfg)[:h, :w]

    # -- reach: run-constrained scan sweeps instead of 1-px wavefronts.
    # Per direction, a cumulative max/min locates the nearest reached pixel
    # along the row/column, and a pixel joins the reached set when that pixel
    # falls inside its own same-label *run* (runs are static during reach, so
    # their boundaries are scanned once).  One sweep propagates along
    # arbitrarily long straight runs, so the while converges in a handful of
    # sweeps (one per geodesic "bend") vs O(superpixel diameter) steps.
    _INF = jnp.int32(2 ** 30)
    labels = labels.astype(jnp.int32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def run_edges(axis, idx):
        chg_lo = labels != _shift_img(labels, *((1, 0) if axis == 0 else (0, 1)), -9)
        chg_hi = labels != _shift_img(labels, *((-1, 0) if axis == 0 else (0, -1)), -9)
        start = jax.lax.cummax(jnp.where(chg_lo, idx, -_INF), axis=axis)
        end = jax.lax.cummin(jnp.where(chg_hi, idx, _INF), axis=axis,
                             reverse=True)
        return start, end

    rs, re = run_edges(1, coli)
    cs, ce = run_edges(0, rowi)

    def sweep(r):
        r = r | (jax.lax.cummax(jnp.where(r, coli, -_INF), axis=1) >= rs)
        r = r | (jax.lax.cummin(jnp.where(r, coli, _INF), axis=1,
                                reverse=True) <= re)
        r = r | (jax.lax.cummax(jnp.where(r, rowi, -_INF), axis=0) >= cs)
        r = r | (jax.lax.cummin(jnp.where(r, rowi, _INF), axis=0,
                                reverse=True) <= ce)
        return r

    # sweep cap shared with the Pallas kernels: components needing more
    # sweeps are degenerate mazes (noise) whose remainder absorb merges —
    # the output stays connected either way
    from pyimsegm_tpu.ops.connectivity_pallas import MAX_SWEEPS

    def reach_cond(state):
        _, changed, it = state
        return changed & (it < MAX_SWEEPS)

    def reach_body(state):
        reached, _, it = state
        new = sweep(reached)
        return new, jnp.any(new != reached), it + 1

    reached, _, _ = jax.lax.while_loop(
        reach_cond, reach_body, (sweep(reached0), jnp.bool_(True), 1))
    return _absorb_unreached(labels, reached, cfg)


def _absorb_unreached(labels, reached, cfg: SlicConfig):
    """Relabel every unreached pixel to its nearest reached donor label.

    Run-filling scans: pack (position, label) of reached pixels and a
    cummax gives each pixel its *nearest reached donor* along the row/col
    (all pixels in between are unreached by construction).  The 3x3-window
    validity region of a fixed label along a row/col is a contiguous
    interval that contains the donor (SLIC grid invariant), so if the
    taker is window-valid every pixel between donor and taker is too —
    whole fragment runs fill in one pass, and the while converges in
    ~fragment-bend-count iterations instead of fragment-diameter ones.
    As pixels are relabelled they join the donor set, so chains of
    unreached regions (e.g. small superpixels adjacent only to other small
    ones in the ``min_size`` merge phase) resolve over iterations.
    """
    h, w = labels.shape
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    labels = labels.astype(jnp.int32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ty = rowi // step
    tx = coli // step
    # pack factor: smallest power of two above the label count; positions
    # times pack must stay inside int32
    pack = 1 << int(gh * gw - 1).bit_length()
    assert max(h, w) * pack < 2 ** 31, 'image too large for packed scans'
    _PACK = jnp.int32(pack)

    _NONE = jnp.int32(-2 ** 30)

    def absorb_pass(labels, reached, axis, reverse, idx):
        # idx is +position (forward: nearest donor behind = max) or
        # -position (reverse: nearest donor ahead = max of negated);
        # floor-mod recovers the label from either sign
        packed = jnp.where(reached, idx * _PACK + labels, _NONE)
        near = jax.lax.cummax(packed, axis=axis, reverse=reverse)
        dl = near % _PACK
        ok = (near > _NONE // 2) & ~reached \
            & (jnp.abs(dl // gw - ty) <= 1) & (jnp.abs(dl % gw - tx) <= 1)
        labels = jnp.where(ok, dl, labels)
        return labels, reached | ok

    def absorb_body(state):
        labels, reached, _, it = state
        r0 = reached
        # nearest donor *behind* p needs max position; *ahead* needs min —
        # flip the packed sign for the reverse direction
        labels, reached = absorb_pass(labels, reached, 1, False, coli)
        labels, reached = absorb_pass(labels, reached, 1, True, -coli)
        labels, reached = absorb_pass(labels, reached, 0, False, rowi)
        labels, reached = absorb_pass(labels, reached, 0, True, -rowi)
        return labels, reached, jnp.any(reached != r0), it + 1

    def absorb_cond(state):
        _, _, changed, it = state
        return changed & (it < 2 * step)

    labels, _, _, _ = jax.lax.while_loop(
        absorb_cond, absorb_body, (labels, reached, jnp.bool_(True), 0))
    return labels


# ------------------------------------------------------ dense grid graph ---
#
# Superpixel adjacency as a dense (gh, gw, 25) tensor: channel d encodes the
# edge to the seed at relative grid offset (dy, dx) in [-2, 2]^2.  Because
# SLIC labels come from each tile's 3x3 seed neighborhood, adjacent pixels'
# labels differ by at most ~2 grid cells, so 5x5 covers (pathological +-3
# outliers are dropped; they are vanishingly rare and carry negligible
# regularisation mass).  This removes the 1-MPix hash sort (jnp.unique) and
# all scatters from the MRF stage: adjacency is built with masked tile
# reductions, and message passing becomes 25 static grid shifts.

GRAPH_OFFSETS = [(dy, dx) for dy in (-2, -1, 0, 1, 2) for dx in (-2, -1, 0, 1, 2)]
_SELF = GRAPH_OFFSETS.index((0, 0))


def _flip_channel_perm():
    return [GRAPH_OFFSETS.index((-dy, -dx)) for dy, dx in GRAPH_OFFSETS]


def _pair_counts_einsum(labels_p, b, cfg: SlicConfig):
    """(gh, gw, 9, 25) directed boundary-pair counts between each pixel's
    label (routed to its 3x3 tile offset) and the paired label ``b`` (5x5
    relative-offset channel); one per-tile one-hot einsum on the MXU."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    hp, wp = labels_p.shape
    tile_y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) // step
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1) // step
    ga_y = labels_p // gw
    ga_x = labels_p % gw
    gb_y = b // gw
    gb_x = b % gw
    dy = gb_y - ga_y
    dx = gb_x - ga_x
    oa_y = ga_y - tile_y + 1
    oa_x = ga_x - tile_x + 1
    ok = ((labels_p != b) & (b >= 0) & (labels_p >= 0)
          & (jnp.abs(dy) <= 2) & (jnp.abs(dx) <= 2)
          & (oa_y >= 0) & (oa_y < 3) & (oa_x >= 0) & (oa_x < 3))
    ch = (dy + 2) * 5 + (dx + 2)
    oa = oa_y * 3 + oa_x
    oh_a = jax.nn.one_hot(jnp.where(ok, oa, 0), 9, dtype=jnp.float32) \
        * ok[..., None].astype(jnp.float32)
    oh_c = jax.nn.one_hot(jnp.where(ok, ch, 0), 25, dtype=jnp.float32)
    a_t = oh_a.reshape(gh, step, gw, step, 9).transpose(0, 2, 1, 3, 4) \
        .reshape(gh * gw, step * step, 9)
    c_t = oh_c.reshape(gh, step, gw, step, 25).transpose(0, 2, 1, 3, 4) \
        .reshape(gh * gw, step * step, 25)
    return jnp.einsum('tpa,tpc->tac', a_t, c_t,
                      preferred_element_type=jnp.float32) \
        .reshape(gh, gw, 9, 25)


def grid_adjacency(labels, cfg: SlicConfig):
    """(gh, gw, 25) float adjacency indicator between each superpixel and its
    grid neighbors, built scatter-free from conn4 pixel pairs.

    Each directed pixel pair (a -> b) contributes to (a's grid cell,
    channel of b's relative offset); both the routing to a's cell (one of the
    3x3 tile neighbours) and the 5x5 channel are one-hot encoded and combined
    in a single per-tile einsum on the MXU — one pass over the pixels instead
    of nine masked (H, W, 25) reductions."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    labels_p = _pad_to_grid(labels, cfg, fill=-2)
    hp, wp = labels_p.shape

    # horizontal pairs: b = right neighbor ; vertical pairs: b = lower
    from pyimsegm_tpu.ops.slic import _pallas_available
    if _pallas_available():
        from pyimsegm_tpu.ops.grid_pallas import grid_adjacency_presence_pallas
        cnt9 = grid_adjacency_presence_pallas(labels, cfg)
    else:
        b_h = jnp.concatenate([labels_p[:, 1:], jnp.full((hp, 1), -2, labels_p.dtype)], 1)
        b_v = jnp.concatenate([labels_p[1:, :], jnp.full((1, wp), -2, labels_p.dtype)], 0)
        cnt9 = (_pair_counts_einsum(labels_p, b_h, cfg)
                + _pair_counts_einsum(labels_p, b_v, cfg))
    adj = jnp.zeros((gh, gw, 25), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        adj = adj + _shift2d(cnt9[:, :, idx], di, dj)
    return _sym_mask_adjacency(adj, gh, gw)


def _sym_mask_adjacency(adj, gh, gw):
    """Symmetrize raw pair-count channels into a 0/1 adjacency and zero
    out-of-range / self channels (shared by the sharded builder)."""
    adj = (adj > 0).astype(jnp.float32)
    # symmetrize: edge (a, d) implies (a+d, -d); partner[y,x,d] = adj at grid
    # cell (y+dy, x+dx), flipped channel
    perm = _flip_channel_perm()
    partner = jnp.stack(
        [_shift2d(adj[..., perm[ci]], -dy, -dx)
         for ci, (dy, dx) in enumerate(GRAPH_OFFSETS)], axis=-1)
    adj = jnp.maximum(adj, partner)
    # mask out-of-range neighbors and self
    oy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    for ci, (dy, dx) in enumerate(GRAPH_OFFSETS):
        ok = ((oy + dy >= 0) & (oy + dy < gh) & (ox + dx >= 0) & (ox + dx < gw)
              & (ci != _SELF))
        adj = adj.at[..., ci].set(jnp.where(ok, adj[..., ci], 0.0))
    return adj


def _neighbor_stack(table_grid):
    """(gh, gw, 25, F): value of the offset-d neighbor for every channel d."""
    return jnp.stack(
        [_shift2d(table_grid, -dy, -dx) for dy, dx in GRAPH_OFFSETS], axis=2)


def grid_edge_weights(labels, cfg: SlicConfig, proba=None, features=None,
                      mean_color=None, edge_type='model', adj=None,
                      centers=None):
    """Dense edge weights replicating `graph_cuts.py:574-657` numerics on the
    (gh, gw, 25) adjacency structure.

    :returns: (gh, gw, 25) weights; 0 where no edge.
    """
    gh, gw = cfg.grid_h, cfg.grid_w
    k = gh * gw
    if adj is None:
        adj = grid_adjacency(labels, cfg)
    n_edges_x2 = jnp.maximum(jnp.sum(adj), 1.0)

    def _std_scaled_exp(dist):
        # exp(-dist / (2*std(dist)^2)) with the std over valid (directed)
        # edges; each undirected edge counted twice identically, so the std
        # matches the reference's per-unique-edge statistics
        mean = jnp.sum(dist * adj) / n_edges_x2
        var = jnp.sum(((dist - mean) ** 2) * adj) / n_edges_x2
        std = jnp.sqrt(var)
        return jnp.exp(-dist / jnp.maximum(2.0 * std ** 2, 1e-12))

    if edge_type.startswith('model'):
        metric = edge_type.split('_')[-1] if '_' in edge_type else 'lT'
        pg = proba.reshape(gh, gw, -1)
        nb = _neighbor_stack(pg)                            # (gh,gw,25,C)
        diff = pg[:, :, None, :] - nb
        if metric == 'l1':
            dist = jnp.sum(jnp.abs(diff), axis=-1)
        elif metric == 'l2':
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        else:
            dist = jnp.max(diff * diff, axis=-1)
        weights = _std_scaled_exp(dist)
    elif edge_type == 'features':
        mu = jnp.mean(features, axis=0)
        sd = jnp.maximum(jnp.std(features, axis=0), 1e-12)
        fg = ((features - mu) / sd).reshape(gh, gw, -1)
        diff = fg[:, :, None, :] - _neighbor_stack(fg)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        weights = _std_scaled_exp(dist)
    elif edge_type == 'color':
        cg = mean_color.reshape(gh, gw, -1)
        diff = cg[:, :, None, :] - _neighbor_stack(cg)
        dist = jnp.sum(jnp.abs(diff), axis=-1)
        weights = _std_scaled_exp(dist)
    else:
        weights = jnp.ones((gh, gw, 25), jnp.float32)

    if edge_type in ('model', 'model_l1', 'model_l2', 'model_lT',
                     'features', 'color', 'spatial'):
        if centers is None:
            shape = labels.shape
            coords = jnp.stack(
                [jax.lax.broadcasted_iota(jnp.float32, shape, d) for d in range(2)]
                + [jnp.ones(shape, jnp.float32)], axis=-1)
            sums = grid_segment_sum(coords, labels, cfg)
            centers = sums[:, :2] / jnp.maximum(sums[:, 2:], 1.0)
        cgrid = centers.reshape(gh, gw, 2)
        cdiff = cgrid[:, :, None, :] - _neighbor_stack(cgrid)
        sdist = jnp.sqrt(jnp.sum(cdiff * cdiff, axis=-1))
        mean_sd = jnp.sum(sdist * adj) / n_edges_x2
        rel = sdist / jnp.maximum(mean_sd, 1e-12)
        weights = weights / jnp.maximum(rel, 1e-12)

    from pyimsegm_tpu.ops.graphcut import MIN_MAX_EDGE_WEIGHT
    weights = jnp.clip(weights, 1.0 / MIN_MAX_EDGE_WEIGHT, MIN_MAX_EDGE_WEIGHT)
    return weights * adj


def grid_mrf_energy(label_grid, unary_grid, wgrid, pairwise):
    """E(l) = sum unary + 1/2 sum_(k,d) w * P(l_k, l_nb) (each edge twice)."""
    c = unary_grid.shape[-1]
    u = jnp.sum(jnp.take_along_axis(unary_grid, label_grid[..., None], -1))
    onehot = jax.nn.one_hot(label_grid, c, dtype=jnp.float32)
    nb = _neighbor_stack(onehot)                            # (gh,gw,25,C)
    pl = onehot @ pairwise                                  # (gh,gw,C)
    pair = jnp.einsum('yxdc,yxc->yxd', nb, pl)
    return u + 0.5 * jnp.sum(wgrid * pair)


def wgrid_from_edges(edges, valid, weights, cfg: SlicConfig):
    """(gh, gw, 25) symmetric edge-weight tensor from an edge list.

    One small scatter (both directions per valid edge); grid-structured
    superpixels are only ever adjacent within +-2 grid cells, so the 5x5
    channel space is exact.  Lets callers with custom edge weights (e.g.
    RG2Sp's inverse spatial distances, `region_growing.py`) ride
    :func:`solve_mrf_grid`'s scatter-free message passing.
    """
    gh, gw = cfg.grid_h, cfg.grid_w
    k = gh * gw
    a, b = edges[:, 0], edges[:, 1]
    ay, ax = a // gw, a % gw
    by, bx = b // gw, b % gw

    def chan(dy, dx):
        return (jnp.clip(dy, -2, 2) + 2) * 5 + (jnp.clip(dx, -2, 2) + 2)

    w = jnp.where(valid, jnp.asarray(weights, jnp.float32), 0.0)
    wg = jnp.zeros((k, 25), jnp.float32)
    wg = wg.at[a, chan(by - ay, bx - ax)].add(w)
    wg = wg.at[b, chan(ay - by, ax - bx)].add(w)
    return wg.reshape(gh, gw, 25)


def solve_mrf_grid(unary, wgrid, pairwise, cfg: SlicConfig, n_mf_iters=30,
                   n_icm_iters=12, damping=0.5):
    """Dense mean-field + ICM on the 25-neighbor grid graph; scatter-free
    drop-in for `pyimsegm_tpu.ops.graphcut.solve_mrf`.

    :param unary: (K, C)
    :param wgrid: (gh, gw, 25)
    :returns: (K,) int32 labels
    """
    gh, gw = cfg.grid_h, cfg.grid_w
    c = unary.shape[-1]
    ug = unary.reshape(gh, gw, c).astype(jnp.float32)
    pairwise = jnp.asarray(pairwise, jnp.float32)

    def message(q):
        # full-f32 passes: cross-backend trajectory alignment (see
        # models/gmm.full_precision)
        with jax.default_matmul_precision('highest'):
            qp = q @ pairwise.T                              # (gh,gw,C)
            nb = _neighbor_stack(qp)                         # (gh,gw,25,C)
            return jnp.einsum('yxd,yxdc->yxc', wgrid, nb)

    q0 = jax.nn.softmax(-ug, axis=-1)

    def mf_step(_, q):
        q_new = jax.nn.softmax(-(ug + message(q)), axis=-1)
        return damping * q_new + (1.0 - damping) * q

    q = jax.lax.fori_loop(0, n_mf_iters, mf_step, q0)
    labels = jnp.argmin(ug + message(q), axis=-1).astype(jnp.int32)

    def icm_step(_, carry):
        labels, best_labels, best_e = carry
        onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
        new_labels = jnp.argmin(ug + message(onehot), axis=-1).astype(jnp.int32)
        e = grid_mrf_energy(new_labels, ug, wgrid, pairwise)
        improved = e < best_e
        best_labels = jnp.where(improved, new_labels, best_labels)
        best_e = jnp.where(improved, e, best_e)
        return new_labels, best_labels, best_e

    e0 = grid_mrf_energy(labels, ug, wgrid, pairwise)
    _, best_labels, _ = jax.lax.fori_loop(
        0, n_icm_iters, icm_step, (labels, labels, e0))
    return best_labels.reshape(-1)
