"""Pallas kernels for grid-structured segment reduction and lookup.

The XLA formulations in `pyimsegm_tpu.ops.grid` are one-hot einsums: correct
and portable, but they materialise a (H, W, 9) routing tensor in HBM
(~40 B/px) per call.  These kernels exploit the same 3x3-tile structure
wholly in VMEM (the routing one-hot never exists as a tensor):

* :func:`grid_reduce_pallas` — per-superpixel sums: one program per tile row
  reads its (F, step, wp) data slab + labels, masks per offset, pools per
  tile column with a static selector matmul (the mirror of the SLIC update
  kernel, `pyimsegm_tpu.ops.slic_pallas`).  Traffic = data + labels,
  ~(4F+4) B/px.
* :func:`grid_lookup_pallas` — table[labels] per pixel: per-offset table
  rows are broadcast to pixel columns with the selector matmul and selected
  by the pixel's offset code.  Traffic = labels + output, ~(4C+4) B/px.

Both recompute the pixel->offset code from the label map with
divide-by-constant arithmetic (cheap VPU) and fall back to the XLA path off
TPU (dispatch handled by the callers in `pyimsegm_tpu.ops.grid`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyimsegm_tpu.ops.slic import SlicConfig

_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]

#: scoped-VMEM budget for the reduce/moments kernels: the default 16M limit
#: overflows once the channel count grows past ~30 at bench tile sizes (the
#: batched texture reductions run 18-39 channels); v5e has 128M physical
_VMEM_REDUCE = 64 * 1024 * 1024


def _offset_code(labels, i, cfg: SlicConfig):
    """Per-pixel routing code 0..8 (-1 invalid) for tile row ``i``."""
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1) // step
    ly = labels // gw
    lx = labels - ly * gw
    dy = ly - i + 1
    dx = lx - tile_x + 1
    valid = (labels >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    return jnp.where(valid, dy * 3 + dx, -1)


def _sel_pool(cfg: SlicConfig):
    """(wp, gw) static 0/1 pooling selector: lane -> its tile column."""
    step, gw, wp = cfg.step, cfg.grid_w, cfg.pad_w
    l_of_row = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0) // step
    g_of_col = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    return (l_of_row == g_of_col).astype(jnp.float32)


def _sel_field(cfg: SlicConfig):
    """(gw, wp) static 0/1 broadcast selector: tile column -> its lanes."""
    step, gw, wp = cfg.step, cfg.grid_w, cfg.pad_w
    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    return (g_of_row == l_of_col).astype(jnp.float32)


def _reduce_kernel(data_ref, labels_ref, out_ref, *, cfg: SlicConfig, f: int):
    """data_ref (F, 1, step, wp), labels_ref (1, step, wp) ->
    out_ref (1, 9*F, gw): per-offset per-tile-column partial sums."""
    i = pl.program_id(0)
    labels = labels_ref[0]
    off = _offset_code(labels, i, cfg)
    sel_pool = _sel_pool(cfg)
    for oi in range(9):
        mask = (off == oi).astype(jnp.float32)
        cols = jnp.concatenate(
            [jnp.sum(data_ref[ci, 0].astype(jnp.float32) * mask, axis=0,
                     keepdims=True) for ci in range(f)], axis=0)  # (F, wp)
        # HIGHEST: the Mosaic f32 dot defaults to one bf16 pass, which
        # rounds the partial sums (these feed mean/std with cancellation)
        out_ref[0, oi * f:(oi + 1) * f, :] = jnp.dot(
            cols, sel_pool, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_reduce_pallas(data, labels, cfg: SlicConfig):
    """Per-superpixel sums of (H, W, F) data over grid-structured labels.

    :param data: (H, W, F) float array (H, W = cfg.height/width)
    :param labels: (H, W) int32 SLIC labels (3x3-tile guarantee)
    :returns: (K, F) float32 sums
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    f = data.shape[-1]
    ph, pw = cfg.pad_h - data.shape[0], cfg.pad_w - data.shape[1]
    # bf16 inputs stay bf16 in HBM (halved traffic; the kernel accumulates
    # in f32), everything else is promoted once here
    if data.dtype != jnp.bfloat16:
        data = data.astype(jnp.float32)
    data_p = jnp.pad(data, [(0, ph), (0, pw), (0, 0)])
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    data_f = jnp.transpose(data_p, (2, 0, 1))            # (F, hp, wp)

    partials = pl.pallas_call(
        functools.partial(_reduce_kernel, cfg=cfg, f=f),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((f, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9 * f, gw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh, 9 * f, gw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_REDUCE),
    )(data_f.reshape(f, gh, step, cfg.pad_w),
      labels_p.reshape(gh, step, cfg.pad_w))

    return _route_partials(partials, gh, gw, f)


def _route_partials(partials, gh, gw, f):
    """Route per-offset per-tile partial sums to their seeds: 9 tiny
    (gh, gw) shifts.  partials: (gh, 9*F, gw) -> (K, F)."""
    parts = jnp.transpose(partials.reshape(gh, 9, f, gw), (0, 3, 1, 2))
    sums = jnp.zeros((gh, gw, f), jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        part = parts[:, :, oi]
        pad = [(max(di, 0), max(-di, 0)), (max(dj, 0), max(-dj, 0)), (0, 0)]
        shifted = jnp.pad(part, pad)[max(-di, 0):max(-di, 0) + gh,
                                     max(-dj, 0):max(-dj, 0) + gw]
        sums = sums + shifted
    return sums.reshape(gh * gw, f)


def _moments_kernel(feat_ref, labels_ref, out_ref, *, cfg: SlicConfig,
                    f: int):
    """feat_ref (F, 1, step, wp), labels_ref (1, step, wp) ->
    out_ref (1, 9*(2F+3), gw): per-offset per-tile-column partial sums of
    [feat, feat^2, 1, global_y, global_x] — the geometry/moment channels
    are synthesized in VMEM, so the (H, W, 2F+3) stacked tensor the XLA
    formulation reduces never exists in HBM."""
    step, wp = cfg.step, cfg.pad_w
    i = pl.program_id(0)
    labels = labels_ref[0]
    off = _offset_code(labels, i, cfg)
    sel_pool = _sel_pool(cfg)
    gy = (jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0)
          + i * step).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(
        jnp.int32, (step, wp), 1).astype(jnp.float32)
    nch = 2 * f + 3
    for oi in range(9):
        mask = (off == oi).astype(jnp.float32)
        feats = [feat_ref[ci, 0].astype(jnp.float32) for ci in range(f)]
        rows = ([jnp.sum(d * mask, axis=0, keepdims=True) for d in feats]
                + [jnp.sum(d * d * mask, axis=0, keepdims=True)
                   for d in feats]
                + [jnp.sum(mask, axis=0, keepdims=True),
                   jnp.sum(gy * mask, axis=0, keepdims=True),
                   jnp.sum(gx * mask, axis=0, keepdims=True)])
        cols = jnp.concatenate(rows, axis=0)               # (2F+3, wp)
        # HIGHEST for the same cancellation reason as _reduce_kernel
        out_ref[0, oi * nch:(oi + 1) * nch, :] = jnp.dot(
            cols, sel_pool, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_moments_pallas(feat, labels, cfg: SlicConfig):
    """Per-superpixel geometry + color moments in one launch.

    The TPU replacement for ``grid_segment_sum`` over the stacked
    ``[feat, feat**2, ones, iota_y, iota_x]`` tensor (the re-reduce after
    connectivity enforcement, `pipelines._slic_features_core`): traffic
    drops from ~(36+4) B/px (stacked f32 channels + labels) to
    ~(4F+4) B/px, and the stack/concat round-trip through HBM disappears.

    :param feat: (H, W, F) float feature image (H, W = cfg.height/width)
    :param labels: (H, W) int32 SLIC labels (3x3-tile guarantee)
    :returns: (K, 2F+3) f32 — [sum feat, sum feat^2, count, sum y, sum x]
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    f = feat.shape[-1]
    nch = 2 * f + 3
    ph, pw = cfg.pad_h - feat.shape[0], cfg.pad_w - feat.shape[1]
    feat_p = jnp.pad(feat.astype(jnp.float32), [(0, ph), (0, pw), (0, 0)])
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    feat_f = jnp.transpose(feat_p, (2, 0, 1))              # (F, hp, wp)

    partials = pl.pallas_call(
        functools.partial(_moments_kernel, cfg=cfg, f=f),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((f, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9 * nch, gw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh, 9 * nch, gw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_REDUCE),
    )(feat_f.reshape(f, gh, step, cfg.pad_w),
      labels_p.reshape(gh, step, cfg.pad_w))

    return _route_partials(partials, gh, gw, nch)


def _moments_apply_kernel(feat_ref, labels_ref, donor_ref, sums_ref,
                          merged_ref, *, cfg: SlicConfig, f: int):
    """Min-size donor application fused with the geometry+moments reduce.

    feat_ref (F, 1, step, wp), labels_ref (1, step, wp),
    donor_ref (gh+2, 1, gw) f32 donor ids -> sums_ref (1, 9*(2F+3), gw)
    partial sums over the MERGED labels + merged_ref (1, step, wp) i32.

    Replaces the separate ``grid_lookup``-based donor apply pass of
    ``min_size_merge`` (one fewer pixel-scale launch; the merged label plane
    is written as a byproduct).  The window guard matches
    ``min_size_merge`` exactly: a pixel whose donor seed falls outside its
    own 3x3 tile window keeps its label.
    """
    step, gw, wp = cfg.step, cfg.grid_w, cfg.pad_w
    i = pl.program_id(0)
    labels = labels_ref[0]
    off = _offset_code(labels, i, cfg)
    sel_field = _sel_field(cfg)

    # donor[labels] via the 3-row broadcast (donor ids < 2^24: exact in f32)
    drows = donor_ref[pl.ds(i, 3)][:, 0]                 # (3, gw)
    donor_px = jnp.full((step, wp), -1.0, jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        row = drows[di + 1]                              # (gw,)
        if dj == -1:
            row = jnp.concatenate([jnp.full((1,), -1.0, row.dtype),
                                   row[:-1]])
        elif dj == 1:
            row = jnp.concatenate([row[1:],
                                   jnp.full((1,), -1.0, row.dtype)])
        field = jnp.dot(row[None, :], sel_field,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (1, wp)
        donor_px = jnp.where(off == oi, field, donor_px)
    new = donor_px.astype(jnp.int32)
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1) // step
    ok = (new >= 0) & (jnp.abs(new // gw - i) <= 1) \
        & (jnp.abs(new % gw - tile_x) <= 1)
    merged = jnp.where(ok, new, labels)
    merged_ref[0] = merged

    off2 = _offset_code(merged, i, cfg)
    gy = (jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0)
          + i * step).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(
        jnp.int32, (step, wp), 1).astype(jnp.float32)
    nch = 2 * f + 3
    sel_pool = _sel_pool(cfg)
    for oi in range(9):
        mask = (off2 == oi).astype(jnp.float32)
        feats = [feat_ref[ci, 0].astype(jnp.float32) for ci in range(f)]
        rows = ([jnp.sum(d * mask, axis=0, keepdims=True) for d in feats]
                + [jnp.sum(d * d * mask, axis=0, keepdims=True)
                   for d in feats]
                + [jnp.sum(mask, axis=0, keepdims=True),
                   jnp.sum(gy * mask, axis=0, keepdims=True),
                   jnp.sum(gx * mask, axis=0, keepdims=True)])
        cols = jnp.concatenate(rows, axis=0)             # (2F+3, wp)
        sums_ref[0, oi * nch:(oi + 1) * nch, :] = jnp.dot(
            cols, sel_pool, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_moments_apply_pallas(feat, labels, donor, cfg: SlicConfig):
    """Apply a min-size donor table and reduce geometry+moments in ONE
    launch.

    :param feat: (H, W, F) float feature image
    :param labels: (H, W) int32 enforced (pre-merge) labels
    :param donor: (K,) int32 fully-resolved merge targets
        (:func:`pyimsegm_tpu.ops.grid.donor_chain_table`)
    :returns: (merged labels (H, W) i32, sums (K, 2F+3) f32 over the merged
        labels — [sum feat, sum feat^2, count, sum y, sum x])
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    f = feat.shape[-1]
    nch = 2 * f + 3
    ph, pw = cfg.pad_h - feat.shape[0], cfg.pad_w - feat.shape[1]
    feat_p = jnp.pad(feat.astype(jnp.float32), [(0, ph), (0, pw), (0, 0)])
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    feat_f = jnp.transpose(feat_p, (2, 0, 1))
    dgrid = donor.astype(jnp.float32).reshape(gh, 1, gw)
    sentinel = jnp.full((1, 1, gw), -1.0, jnp.float32)
    donor_pad = jnp.concatenate([sentinel, dgrid, sentinel], axis=0)

    sums, merged = pl.pallas_call(
        functools.partial(_moments_apply_kernel, cfg=cfg, f=f),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((f, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh + 2, 1, gw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 9 * nch, gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gh, 9 * nch, gw), jnp.float32),
            jax.ShapeDtypeStruct((gh, step, cfg.pad_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_REDUCE),
    )(feat_f.reshape(f, gh, step, cfg.pad_w),
      labels_p.reshape(gh, step, cfg.pad_w), donor_pad)

    merged2d = merged.reshape(cfg.pad_h, cfg.pad_w)[:cfg.height, :cfg.width]
    return merged2d, _route_partials(sums, gh, gw, nch)


def _lookup_kernel(labels_ref, table_ref, out_ref, *, cfg: SlicConfig,
                   c: int):
    """labels_ref (1, step, wp), table_ref (gh+2, C, gw) ->
    out_ref (C, 1, step, wp): table value of each pixel's superpixel."""
    step = cfg.step
    wp = cfg.pad_w
    i = pl.program_id(0)
    labels = labels_ref[0]
    off = _offset_code(labels, i, cfg)
    sel_field = _sel_field(cfg)
    trows = table_ref[pl.ds(i, 3)]                       # (3, C, gw)
    out = [jnp.zeros((step, wp), jnp.float32) for _ in range(c)]
    for oi, (di, dj) in enumerate(_OFFSETS):
        row = trows[di + 1]                              # (C, gw)
        if dj == -1:
            row = jnp.concatenate(
                [jnp.zeros((c, 1), row.dtype), row[:, :-1]], axis=1)
        elif dj == 1:
            row = jnp.concatenate(
                [row[:, 1:], jnp.zeros((c, 1), row.dtype)], axis=1)
        field = jnp.dot(row, sel_field,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)   # (C, wp)
        take = off == oi
        for ci in range(c):
            out[ci] = jnp.where(take, field[ci:ci + 1, :], out[ci])
    for ci in range(c):
        out_ref[ci, 0] = out[ci]


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_lookup_pallas(table, labels, cfg: SlicConfig):
    """Per-pixel ``table[labels]`` for grid-structured labels.

    :param table: (K, C) float32
    :param labels: (H, W) int32
    :returns: (H, W, C) float32
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    c = table.shape[-1]
    ph, pw = cfg.pad_h - labels.shape[0], cfg.pad_w - labels.shape[1]
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    tgrid = jnp.transpose(table.astype(jnp.float32).reshape(gh, gw, c),
                          (0, 2, 1))                     # (gh, C, gw)
    sentinel = jnp.zeros((1, c, gw), jnp.float32)
    table_pad = jnp.concatenate([sentinel, tgrid, sentinel], axis=0)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, cfg=cfg, c=c),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh + 2, c, gw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 1, step, cfg.pad_w),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, gh, step, cfg.pad_w), jnp.float32),
    )(labels_p.reshape(gh, step, cfg.pad_w), table_pad)
    out = jnp.transpose(out.reshape(c, cfg.pad_h, cfg.pad_w), (1, 2, 0))
    return out[:cfg.height, :cfg.width]


def _pair_count_kernel(labels_ref, labels_down_ref, out_ref, *,
                       cfg: SlicConfig):
    """Conn4 pair *counts* + pixel counts, field-packed, MXU-reduced.

    labels_ref / labels_down_ref: (1, step, wp) int32 — the tile row and the
    same row shifted up one pixel.  out_ref: (1, 252, gw) f32 — per routing
    offset ``oa`` (9) x word ``k`` (14) x field (lo/hi), pooled to tile
    columns.  Word k < 13 packs boundary-pair counts for channels
    ``ch = 2k`` (lo field, x1) and ``ch = 2k+1`` (hi field, x65536); word 13
    is the per-offset pixel count.  Packed per-pixel values stay <= 131074
    and every contraction sum < 2^24, so f32 arithmetic is exact end-to-end.
    """
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    i = pl.program_id(0)
    labels = labels_ref[0]
    oa = _offset_code(labels, i, cfg)

    ga_y = labels // gw
    ga_x = labels - ga_y * gw

    def pair_fields(b):
        gb_y = b // gw
        gb_x = b - gb_y * gw
        dy = gb_y - ga_y
        dx = gb_x - ga_x
        ok = ((labels != b) & (b >= 0) & (labels >= 0)
              & (jnp.abs(dy) <= 2) & (jnp.abs(dx) <= 2))
        ch = (dy + 2) * 5 + (dx + 2)
        val = jnp.where((ch & 1) == 1, 65536.0, 1.0)
        return ok, ch >> 1, val

    minus2 = jnp.full((step, 1), -2, jnp.int32)
    b_right = jnp.concatenate([labels[:, 1:], minus2], axis=1)
    srcs = [pair_fields(b_right), pair_fields(labels_down_ref[0])]
    words = []
    for k in range(13):
        w = jnp.zeros((step, wp), jnp.float32)
        for ok, wk, val in srcs:
            w = w + jnp.where(ok & (wk == k), val, 0.0)
        words.append(w)

    # block-diagonal sublane-sum selector: row k sums word k's pixel rows
    r_of = jax.lax.broadcasted_iota(jnp.int32, (14, 14 * step), 0)
    c_of = jax.lax.broadcasted_iota(jnp.int32, (14, 14 * step), 1) // step
    blk = (r_of == c_of).astype(jnp.float32)

    per_oi = []
    for oi in range(9):
        sel = oa == oi
        stacked = jnp.concatenate(
            [jnp.where(sel, w, 0.0) for w in words]
            + [sel.astype(jnp.float32)], axis=0)          # (14*step, wp)
        per_oi.append(jnp.dot(blk, stacked,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST))
    v = jnp.concatenate(per_oi, axis=0)                   # (126, wp)
    hi = jnp.floor(v * (1.0 / 65536.0))
    lo = v - hi * 65536.0
    sel_pool = _sel_pool(cfg)
    out_ref[0] = jnp.dot(jnp.concatenate([lo, hi], axis=0), sel_pool,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_pair_count_pallas(labels, cfg: SlicConfig):
    """Conn4 directed boundary-pair counts + pixel counts in one launch.

    :param labels: (H, W) int32 grid-structured labels
    :returns: (cnt9 (gh, gw, 9, 25) f32 directed pair counts grouped by the
        first endpoint's routing offset — same tensor as the XLA
        ``_pair_counts_einsum`` sum over right+down sources — and
        counts9 (gh, gw, 9) f32 pixel counts per routing offset)
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    ph, pw = cfg.pad_h - labels.shape[0], cfg.pad_w - labels.shape[1]
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    labels_down = jnp.concatenate(
        [labels_p[1:], jnp.full((1, cfg.pad_w), -2, labels_p.dtype)], axis=0)

    pooled = pl.pallas_call(
        functools.partial(_pair_count_kernel, cfg=cfg),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 252, gw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh, 252, gw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(labels_p.reshape(gh, step, cfg.pad_w),
      labels_down.reshape(gh, step, cfg.pad_w))

    lo = pooled[:, :126].reshape(gh, 9, 14, gw)
    hi = pooled[:, 126:].reshape(gh, 9, 14, gw)
    counts9 = jnp.transpose(lo[:, :, 13], (0, 2, 1))      # (gh, gw, 9)
    # interleave lo/hi back into the 25 channels (ch = 2k / 2k+1)
    pairs = jnp.stack([lo[:, :, :13], hi[:, :, :13]], axis=3) \
        .reshape(gh, 9, 26, gw)[:, :, :25]
    cnt9 = jnp.transpose(pairs, (0, 3, 1, 2))             # (gh, gw, 9, 25)
    return cnt9, counts9


def _adjacency_kernel(labels_ref, labels_down_ref, out_ref, *,
                      cfg: SlicConfig):
    """Conn4 pair presence, bit-packed.

    labels_ref / labels_down_ref: (1, step, wp) int32 — the tile row and the
    same row shifted up one pixel (so every pixel sees its down neighbour).
    out_ref: (1, 9, wp) int32 — per routing-offset ``oa``, the OR over this
    block's pixel rows of ``1 << ch`` words, where ch in [0, 25) encodes the
    relative grid offset of the neighbour's superpixel.  Lane pooling to tile
    columns and bit decoding happen in XLA (tiny tensors).
    """
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    i = pl.program_id(0)
    labels = labels_ref[0]
    oa = _offset_code(labels, i, cfg)

    ga_y = labels // gw
    ga_x = labels - ga_y * gw

    def pair_bits(b):
        gb_y = b // gw
        gb_x = b - gb_y * gw
        dy = gb_y - ga_y
        dx = gb_x - ga_x
        ok = ((labels != b) & (b >= 0) & (labels >= 0)
              & (jnp.abs(dy) <= 2) & (jnp.abs(dx) <= 2))
        ch = (dy + 2) * 5 + (dx + 2)
        return jnp.where(ok, jnp.left_shift(jnp.int32(1), ch), 0)

    minus2 = jnp.full((step, 1), -2, jnp.int32)
    b_right = jnp.concatenate([labels[:, 1:], minus2], axis=1)
    bits = pair_bits(b_right) | pair_bits(labels_down_ref[0])   # (step, wp)

    for oi in range(9):
        sel = jnp.where(oa == oi, bits, 0)
        # halving OR tree: ~log2(step) wide ops instead of `step` row ops
        n = step
        while n > 1:
            h = (n + 1) // 2
            top = sel[:h]
            bot = sel[h:n]
            if bot.shape[0] < h:
                bot = jnp.concatenate(
                    [bot, jnp.zeros((h - bot.shape[0], wp), jnp.int32)],
                    axis=0)
            sel = top | bot
            n = h
        out_ref[0, oi:oi + 1, :] = sel


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid_adjacency_presence_pallas(labels, cfg: SlicConfig):
    """(gh, gw, 9, 25) 0/1 presence of conn4 superpixel adjacency, grouped by
    the routing offset of the first endpoint (drop-in for the one-hot einsum
    ``pair_counts`` in `pyimsegm_tpu.ops.grid.grid_adjacency`, presence
    instead of counts — downstream only tests > 0)."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    ph, pw = cfg.pad_h - labels.shape[0], cfg.pad_w - labels.shape[1]
    labels_p = jnp.pad(labels, [(0, ph), (0, pw)], constant_values=-2)
    labels_down = jnp.concatenate(
        [labels_p[1:], jnp.full((1, cfg.pad_w), -2, labels_p.dtype)], axis=0)

    words = pl.pallas_call(
        functools.partial(_adjacency_kernel, cfg=cfg),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, cfg.pad_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh, 9, cfg.pad_w), jnp.int32),
    )(labels_p.reshape(gh, step, cfg.pad_w),
      labels_down.reshape(gh, step, cfg.pad_w))

    # lane pooling (OR over each tile column) + bit decode, all tiny
    words = words.reshape(gh, 9, gw, step)
    pooled = words[..., 0]
    for s in range(1, step):
        pooled = pooled | words[..., s]                   # (gh, 9, gw)
    bits = (pooled[..., None] >> jnp.arange(25, dtype=jnp.int32)) & 1
    return jnp.transpose(bits, (0, 2, 1, 3)).astype(jnp.float32)
