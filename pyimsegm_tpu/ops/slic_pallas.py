"""Fused Pallas SLIC iteration kernel.

The XLA formulation of SLIC (`pyimsegm_tpu.ops.slic`) materialises nine
upsampled center fields per assign pass and re-scans the pixels for the
update, costing ~50 ms/MPix on one chip.  This kernel fuses assignment and
the update partial-reduction into one pass over the pixels:

* grid = one program per tile row; each program holds its row of pixels
  (``3 x step x wp`` Lab block, channel-first so pixels sit on the natural
  sublane x lane tiles) and the three relevant center rows in VMEM;
* candidate-center fields are broadcast in-register with one small MXU
  matmul per offset (``centers (5, gw) @ selector (gw, wp)``) — the selector
  is a static 0/1 matrix built from iotas, so there are no transposes and no
  HBM intermediates;
* per-offset partial sums (Lab, y, x, count) are pooled per tile column with
  the mirrored selector matmul instead of a scatter.

HBM traffic is pared to the bone: the pixel buffer is bf16 (6 B/px), the
validity mask is recomputed from iotas instead of loaded, and labels are
only written by the final pass (update passes emit just the tiny per-tile
partials) — ~6 B/px per update pass.

The tiny cross-tile combine (shift partials by their offset, divide by
counts) stays in XLA.  SLICO (adaptive compactness) still uses the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyimsegm_tpu.ops.slic import SlicConfig

_BIG = 1e10
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _slic_pass_kernel(lab_ref, centers_ref, spatial_ref, out_ref, *,
                      cfg: SlicConfig, want_labels: bool):
    """One SLIC pass for one tile row.

    lab_ref:      (3, 1, step, wp)  Lab pixels of this tile row
    centers_ref:  (gh+2, 5, gw)    all centers ([l,a,b,y,x]), 1 sentinel row
                                   of padding on each side
    spatial_ref:  (1, 1)           (m/step)^2 in SMEM
    out_ref:      want_labels: (1, step, wp) winning superpixel id
                  else:        (1, 54, gw)   9 offsets x [3 Lab, y, x, count]
    """
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    i = pl.program_id(0)

    # pixels are stored bf16 in HBM (halves the per-iteration read traffic);
    # all arithmetic is f32
    l0 = lab_ref[0, 0].astype(jnp.float32)
    l1 = lab_ref[1, 0].astype(jnp.float32)
    l2 = lab_ref[2, 0].astype(jnp.float32)               # (step, wp)
    sw = spatial_ref[0, 0]

    # mosaic iota must be integer; cast after
    iy = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0) + i * step
    ix = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1)
    py = iy.astype(jnp.float32)
    px = ix.astype(jnp.float32)
    # validity recomputed from iotas — no mask plane in HBM
    valid = ((iy < cfg.height) & (ix < cfg.width)).astype(jnp.float32)
    lane_tile = ix // step

    # static selector: sel_field[g, l] = 1 iff lane l belongs to tile col g
    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    sel_field = (g_of_row == l_of_col).astype(jnp.float32)     # (gw, wp)

    crows = centers_ref[pl.ds(i, 3)]                     # (3, 5, gw)

    best_d = jnp.full((step, wp), _BIG, jnp.float32)
    best_o = jnp.zeros((step, wp), jnp.int32)

    for oi, (di, dj) in enumerate(_OFFSETS):
        row = crows[di + 1]                              # (5, gw)
        if dj == -1:
            row = jnp.concatenate(
                [jnp.full((5, 1), _BIG, row.dtype), row[:, :-1]], axis=1)
        elif dj == 1:
            row = jnp.concatenate(
                [row[:, 1:], jnp.full((5, 1), _BIG, row.dtype)], axis=1)
        field = jnp.dot(row, sel_field,
                        preferred_element_type=jnp.float32)    # (5, wp)
        dc2 = ((l0 - field[0:1, :]) ** 2 + (l1 - field[1:2, :]) ** 2
               + (l2 - field[2:3, :]) ** 2)
        ds2 = (py - field[3:4, :]) ** 2 + (px - field[4:5, :]) ** 2
        d = dc2 + ds2 * sw
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_o = jnp.where(take, oi, best_o)

    if want_labels:
        label = jnp.zeros((step, wp), jnp.int32)
        for oi, (di, dj) in enumerate(_OFFSETS):
            label = jnp.where(best_o == oi, (i + di) * gw + lane_tile + dj,
                              label)
        out_ref[0] = label
        return

    l_of_row = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0) // step
    g_of_col = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    sel_pool = (l_of_row == g_of_col).astype(jnp.float32)      # (wp, gw)
    for oi in range(9):
        mask = jnp.where(best_o == oi, valid, 0.0)
        data6 = jnp.concatenate(
            [jnp.sum(l0 * mask, axis=0, keepdims=True),
             jnp.sum(l1 * mask, axis=0, keepdims=True),
             jnp.sum(l2 * mask, axis=0, keepdims=True),
             jnp.sum(py * mask, axis=0, keepdims=True),
             jnp.sum(px * mask, axis=0, keepdims=True),
             jnp.sum(mask, axis=0, keepdims=True)], axis=0)    # (6, wp)
        part = jnp.dot(data6, sel_pool,
                       preferred_element_type=jnp.float32)     # (6, gw)
        out_ref[0, oi * 6:(oi + 1) * 6, :] = part


def _pallas_pass(lab_chw, centers, spatial_w2, cfg: SlicConfig,
                 want_labels: bool):
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    centers_t = jnp.transpose(centers, (0, 2, 1))        # (gh, 5, gw)
    sentinel = jnp.full((1, 5, gw), _BIG, jnp.float32)
    centers_pad = jnp.concatenate([sentinel, centers_t, sentinel], axis=0)
    spatial = jnp.asarray(spatial_w2, jnp.float32).reshape(1, 1)

    if want_labels:
        out_spec = pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((gh, step, cfg.pad_w), jnp.int32)
    else:
        out_spec = pl.BlockSpec((1, 54, gw), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((gh, 54, gw), jnp.float32)

    return pl.pallas_call(
        functools.partial(_slic_pass_kernel, cfg=cfg,
                          want_labels=want_labels),
        grid=(gh,),
        in_specs=[
            # 4D layout (3, gh, step, wp): the last two block dims equal the
            # array dims, satisfying the TPU (8, 128)-divisibility rule for
            # the non-multiple tile size `step`
            pl.BlockSpec((3, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh + 2, 5, gw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
    )(lab_chw.reshape(3, gh, step, cfg.pad_w), centers_pad, spatial)


@functools.partial(jax.jit, static_argnames=('cfg',))
def slic_update_pallas(lab_chw, centers, spatial_w2, cfg: SlicConfig):
    """One fused assign+partial-update pass (no label write).

    :param lab_chw: (3, pad_h, pad_w) Lab pixels (bf16 ok)
    :param centers: (gh, gw, 5) float32 [l, a, b, y, x]
    :param spatial_w2: scalar (m/step)^2 spatial weight factor
    :returns: partials (gh, gw, 9, 6)
    """
    partials = _pallas_pass(lab_chw, centers, spatial_w2, cfg,
                            want_labels=False)
    return jnp.transpose(partials.reshape(cfg.grid_h, 9, 6, cfg.grid_w),
                         (0, 3, 1, 2))


@functools.partial(jax.jit, static_argnames=('cfg',))
def slic_assign_pallas(lab_chw, centers, spatial_w2, cfg: SlicConfig):
    """Final assignment pass: (pad_h, pad_w) int32 labels."""
    labels = _pallas_pass(lab_chw, centers, spatial_w2, cfg,
                          want_labels=True)
    return labels.reshape(cfg.pad_h, cfg.pad_w)


def slic_iteration_pallas(lab_chw, valid, centers, spatial_w2,
                          cfg: SlicConfig):
    """Back-compat wrapper returning (labels, partials); prefer the split
    :func:`slic_update_pallas` / :func:`slic_assign_pallas` entry points
    (the ``valid`` plane is recomputed in-kernel and ignored here)."""
    del valid
    labels = slic_assign_pallas(lab_chw, centers, spatial_w2, cfg)
    partials = slic_update_pallas(lab_chw, centers, spatial_w2, cfg)
    return labels, partials


def combine_partials(partials, centers):
    """Shift per-offset partials to their target seed and update centers.

    :param partials: (gh, gw, 9, 6)
    :param centers: (gh, gw, 5) previous centers (kept where cluster empty)
    :returns: (gh, gw, 5) new centers
    """
    gh, gw = partials.shape[:2]
    sums = jnp.zeros((gh, gw, 6), jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        part = partials[:, :, oi]
        pad = [(max(di, 0), max(-di, 0)), (max(dj, 0), max(-dj, 0)), (0, 0)]
        shifted = jnp.pad(part, pad)[max(-di, 0):max(-di, 0) + gh,
                                     max(-dj, 0):max(-dj, 0) + gw]
        sums = sums + shifted
    cnt = sums[..., 5:6]
    new = sums[..., :5] / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt > 0, new, centers)
