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

The tiny cross-tile combine (shift partials by their offset, divide by
counts) stays in XLA.  One pixel pass per iteration is ~20 B/px of HBM
traffic — two orders of magnitude below the XLA path.

SLICO (adaptive compactness) still uses the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyimsegm_tpu.ops.slic import SlicConfig

_BIG = 1e10
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _slic_iter_kernel(lab_ref, centers_ref, valid_ref, spatial_ref,
                      labels_ref, partials_ref, *, cfg: SlicConfig):
    """One SLIC iteration for one tile row.

    lab_ref:      (3, 1, step, wp)  Lab pixels of this tile row
    centers_ref:  (gh+2, 5, gw)    all centers ([l,a,b,y,x]), 1 sentinel row
                                   of padding on each side
    valid_ref:    (1, step, wp)    1.0 inside the image
    spatial_ref:  (1, 1)           (m/step)^2 in SMEM
    labels_ref:   (1, step, wp)    out: winning superpixel id
    partials_ref: (1, 54, gw)      out: 9 offsets x [3 Lab, y, x, count]
    """
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    i = pl.program_id(0)

    # pixels are stored bf16 in HBM (halves the per-iteration read traffic);
    # all arithmetic is f32
    l0 = lab_ref[0, 0].astype(jnp.float32)
    l1 = lab_ref[1, 0].astype(jnp.float32)
    l2 = lab_ref[2, 0].astype(jnp.float32)               # (step, wp)
    valid = valid_ref[0]
    sw = spatial_ref[0, 0]

    # mosaic iota must be integer; cast after
    py = (jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0).astype(jnp.float32)
          + (i * step).astype(jnp.float32))
    px = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1).astype(jnp.float32)
    lane_tile = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1) // step

    # static selector: sel_field[g, l] = 1 iff lane l belongs to tile col g
    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    sel_field = (g_of_row == l_of_col).astype(jnp.float32)     # (gw, wp)
    l_of_row = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0) // step
    g_of_col = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    sel_pool = (l_of_row == g_of_col).astype(jnp.float32)      # (wp, gw)

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

    label = jnp.zeros((step, wp), jnp.int32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        label = jnp.where(best_o == oi, (i + di) * gw + lane_tile + dj, label)
    labels_ref[0] = label

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
        partials_ref[0, oi * 6:(oi + 1) * 6, :] = part


@functools.partial(jax.jit, static_argnames=('cfg',))
def slic_iteration_pallas(lab_chw, valid, centers, spatial_w2, cfg: SlicConfig):
    """One fused assign+partial-update pass.

    :param lab_chw: (3, pad_h, pad_w) float32 Lab pixels
    :param valid: (pad_h, pad_w) float32 mask
    :param centers: (gh, gw, 5) float32 [l, a, b, y, x]
    :param spatial_w2: scalar (m/step)^2 * ... full spatial weight factor
    :returns: (labels (pad_h, pad_w) int32, partials (gh, gw, 9, 6))
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    centers_t = jnp.transpose(centers, (0, 2, 1))        # (gh, 5, gw)
    sentinel = jnp.full((1, 5, gw), _BIG, jnp.float32)
    centers_pad = jnp.concatenate([sentinel, centers_t, sentinel], axis=0)
    spatial = jnp.asarray(spatial_w2, jnp.float32).reshape(1, 1)

    labels, partials = pl.pallas_call(
        functools.partial(_slic_iter_kernel, cfg=cfg),
        grid=(gh,),
        in_specs=[
            # 4D layout (3, gh, step, wp): the last two block dims equal the
            # array dims, satisfying the TPU (8, 128)-divisibility rule for
            # the non-multiple tile size `step`
            pl.BlockSpec((3, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh + 2, 5, gw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 54, gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gh, step, cfg.pad_w), jnp.int32),
            jax.ShapeDtypeStruct((gh, 54, gw), jnp.float32),
        ],
    )(lab_chw.reshape(3, gh, step, cfg.pad_w), centers_pad,
      valid.reshape(gh, step, cfg.pad_w), spatial)
    labels = labels.reshape(cfg.pad_h, cfg.pad_w)
    partials = jnp.transpose(partials.reshape(gh, 9, 6, gw), (0, 3, 1, 2))
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
