"""Single-launch fused connectivity enforcement (seed + reach + absorb).

Round-2 ran enforcement as an XLA anchor stage (centroid lookup +
segment-min + threshold, ~14 ms on the 13.8-MPix bench batch) feeding two
banded Pallas kernels (reach, absorb, ~22 ms).  This kernel fuses all three
into ONE banded launch:

* the anchor seed is computed *in-kernel*: per-pixel squared distance to the
  own-superpixel centroid (centroid table broadcast with the static selector
  matmul), then a per-(tile, offset) min pool — masked sublane min + one
  segmented lane min-scan + a boundary-lane selector matmul — combined over
  the 9 offsets with tiny grid-scale shifts.  Band-local minima equal global
  minima for every decided pixel's superpixel (a superpixel whose seed row is
  within decided +-1 spans at most decided +-2 tile rows = the 2-tile-row
  halo), so the seed matches the XLA path bit-for-bit on decided rows;
* reach and absorb run exactly as in `ops/connectivity_pallas` (run-
  constrained scan sweeps; packed nearest-donor fills), but on the band
  already in VMEM — no reach-plane round-trip through HBM.  Absorb reads the
  *band-local* reach for halo rows (the two-launch version stitched the
  exact owning-band reach); superpixels seeded outside decided +-1 can be
  mis-seeded in the halo, which can flip a donor choice for a fragment
  within 2 tile rows of a band seam.  Measured on the bench datasets this
  changes <0.01% of pixels vs the stitched two-launch path and no pipeline
  metric moves; the fusion saves one full label-plane round-trip and a
  second grid sequencing.

Matches the reference's always-on skimage ``enforce_connectivity=True``
semantics (`/root/reference/imsegm/superpixels.py:61-63`) the same way the
XLA path does (fragments merge into adjacent superpixels, K stays static).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyimsegm_tpu.ops.slic import SlicConfig
from pyimsegm_tpu.ops.connectivity_pallas import (
    MAX_SWEEPS, _HALO, _INF, _banded, _max_scan, _min_scan, _shift,
    band_fits, band_rows_for)

_BIG = 1e10  # +inf stand-in (inf * 0 = nan would poison the selector matmul)

#: live (band_rows, wp) vector temporaries this kernel's stack holds —
#: calibrated from the round-3 compile OOM: 109.18M observed at 595x1225
#: bands = ~37.4 planes; 42 leaves headroom for Mosaic scheduling variance
PLANES_FUSED = 42
VMEM_FUSED = 100 * 1024 * 1024


def fused_fits(cfg: SlicConfig):
    """True when a minimal band of this kernel fits the scoped-VMEM budget;
    callers must take the two-launch/XLA path otherwise (the mandatory size
    guard — this kernel OOM'd the round-3 bench unconditionally)."""
    return band_fits(cfg.step, cfg.pad_w, PLANES_FUSED, VMEM_FUSED)


def _enforce_kernel(lab_ref, cyx_ref, out_ref, *, cfg: SlicConfig,
                    r_dec, band_tr, dec_rows, pack, reach_cap, absorb_cap):
    """One band: seed + reach + absorb; writes the decided tile rows."""
    step, gw = cfg.step, cfg.grid_w
    b = pl.program_id(0)
    lab = lab_ref[0]                                   # (band_rows, wp) i32
    band_rows, wp = lab.shape

    rowi = jax.lax.broadcasted_iota(jnp.int32, (band_rows, wp), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (band_rows, wp), 1)
    valid = lab >= 0
    labc = jnp.where(valid, lab, 0)

    # global pixel coords (top halo rows of band 0 sit above the image; they
    # are -9 filled and masked everywhere)
    gy = (rowi + (b * r_dec - _HALO) * step).astype(jnp.float32)
    gx = coli.astype(jnp.float32)
    ty = rowi // step                                  # band-local tile row
    tx = coli // step
    ly = labc // gw
    lx = labc - ly * gw
    dyc = ly - (ty + b * r_dec - _HALO)                # -1..1 when valid
    dxc = lx - tx
    code = jnp.where(valid & (jnp.abs(dyc) <= 1) & (jnp.abs(dxc) <= 1),
                     (dyc + 1) * 3 + (dxc + 1), -1)

    # ---- own-centroid broadcast: 3 selector matmuls + lane rolls --------
    # cyx_ref rows are tile rows shifted +3 (3 sentinel rows each side);
    # band tiles span [b*r_dec - 2, b*r_dec + r_dec + 2), their labels'
    # rows one further.
    crows = cyx_ref[pl.ds(b * r_dec, band_tr + 2)]     # (band_tr+2, 8, gw)
    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    sel_field = (g_of_row == l_of_col).astype(jnp.float32)   # (gw, wp)

    # sublane resamplers (matmuls -- Mosaic has no strided sublane gather):
    # UP broadcasts one row per tile row to its `step` pixel rows; LAST picks
    # the last pixel row of each tile row (where inclusive scans finish)
    r_of = jax.lax.broadcasted_iota(jnp.int32, (band_rows, band_tr), 0)
    t_of = jax.lax.broadcasted_iota(jnp.int32, (band_rows, band_tr), 1)
    up_sel = (r_of // step == t_of).astype(jnp.float32)   # (band_rows, bt)
    last_sel = (r_of == t_of * step + step - 1).astype(jnp.float32)

    def _up(tile_rows):                                # (band_tr, wp) -> px
        return jax.lax.dot(up_sel, tile_rows,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

    cy = jnp.zeros((band_rows, wp), jnp.float32)
    cx = jnp.zeros((band_rows, wp), jnp.float32)
    for di in (-1, 0, 1):
        rows = crows[di + 1:di + 1 + band_tr]          # (band_tr, 8, gw)
        f = jax.lax.dot(rows.reshape(band_tr * 8, gw), sel_field,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        f = f.reshape(band_tr, 8, wp)
        fy = _up(f[:, 0, :])
        fx = _up(f[:, 1, :])
        for dj in (-1, 0, 1):
            oi = (di + 1) * 3 + (dj + 1)
            take = code == oi
            cy = jnp.where(take, _shift(fy, -dj * step, 1, 0.0), cy)
            cx = jnp.where(take, _shift(fx, -dj * step, 1, 0.0), cx)

    d2 = (gy - cy) * (gy - cy) + (gx - cx) * (gx - cx)
    d2 = jnp.where(valid, d2, _BIG)

    # ---- per-(tile, offset) d2 min pool + 9 grid shifts -----------------
    # boundary-lane picker: last lane of each tile column
    l_of_row2 = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0)
    g_of_col2 = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    bsel = ((l_of_row2 == g_of_col2 * step + step - 1)
            ).astype(jnp.float32)                      # (wp, gw)
    # segmented scan masks: element may take from distance d back only when
    # both sit in the same tile row / tile column
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (band_tr, wp), 1)
    row_g = rowi // step

    mins = []                                          # 9 x (band_tr, gw)
    for oi in range(9):
        v = jnp.where(code == oi, d2, _BIG)
        # segmented sublane min-scan: last pixel row of each tile row ends
        # up holding the tile-row group min
        d = 1
        while d < step:
            ok = (rowi - d) // step == row_g
            v = jnp.minimum(v, jnp.where(ok, _shift(v, d, 0, _BIG), _BIG))
            d *= 2
        v = jax.lax.dot(last_sel.T, v,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (band_tr, wp)
        d = 1
        while d < step:
            ok = (lane_t - d) // step == lane_t // step
            v = jnp.minimum(v, jnp.where(ok, _shift(v, d, 1, _BIG), _BIG))
            d *= 2
        mins.append(jax.lax.dot(v, bsel,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32))

    # combine: bin (t, oi) belongs to superpixel tile (t+di, g+dj)
    d2min = jnp.full((band_tr, gw), _BIG, jnp.float32)
    for oi in range(9):
        di, dj = oi // 3 - 1, oi % 3 - 1
        m = _shift(_shift(mins[oi], di, 0, _BIG), dj, 1, _BIG)
        d2min = jnp.minimum(d2min, m)

    # ---- reached0: d2 <= d2min(own superpixel) + eps --------------------
    dm = jnp.zeros((band_rows, wp), jnp.float32)
    for di in (-1, 0, 1):
        row = _shift(d2min, -di, 0, _BIG)              # (band_tr, gw)
        f = jax.lax.dot(row, sel_field,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (band_tr, wp)
        fb = _up(f)
        for dj in (-1, 0, 1):
            oi = (di + 1) * 3 + (dj + 1)
            take = code == oi
            dm = jnp.where(take, _shift(fb, -dj * step, 1, _BIG), dm)

    # seed = anchor only (pixels nearest their own centroid): reach is then
    # exactly "connected to the anchor", so enforcement leaves every
    # superpixel a single 4-connected region — the contract
    # `enforce_grid_connectivity` documents and `tests/test_slic.py` pins.
    # (round 3 additionally seeded 3x3-solid "cores" to cut reach sweeps,
    # which let thick detached fragments survive multi-component — reverted)
    r = ((d2 <= dm + 1e-3) & valid).astype(jnp.int32)

    # ---- reach: run-constrained scan sweeps (ops/connectivity_pallas) ---
    lim_w = min(wp, 3 * step + 2)
    lim_h = min(band_rows, 3 * step + 2)

    def run_edges(axis, idx, n):
        chg_lo = lab != _shift(lab, 1, axis, -9)
        chg_hi = lab != _shift(lab, -1, axis, -9)
        start = _max_scan(jnp.where(chg_lo, idx, -_INF), axis, n)
        end = _min_scan(jnp.where(chg_hi, idx, _INF), axis, n)
        return start, end

    rs, re = run_edges(1, coli, lim_w)
    cs, ce = run_edges(0, rowi, lim_h)

    def sweep(rb):
        t = jnp.where(rb, coli, -_INF)
        rb = rb | (_max_scan(t, 1, lim_w) >= rs)
        t = jnp.where(rb, coli, _INF)
        rb = rb | (_min_scan(t, 1, lim_w) <= re)
        t = jnp.where(rb, rowi, -_INF)
        rb = rb | (_max_scan(t, 0, lim_h) >= cs)
        t = jnp.where(rb, rowi, _INF)
        rb = rb | (_min_scan(t, 0, lim_h) <= ce)
        return rb & valid

    def reach_cond(state):
        _, changed, it = state
        return (changed > 0) & (it < reach_cap)

    def reach_body(state):
        rr, _, it = state
        r2 = sweep(rr != 0).astype(jnp.int32)
        return r2, jnp.sum(r2 - rr), it + 1

    r, _, _ = jax.lax.while_loop(
        reach_cond, reach_body,
        (sweep(r != 0).astype(jnp.int32), jnp.int32(1), jnp.int32(1)))

    # ---- absorb: packed nearest-donor fills ------------------------------
    aty = ty + b * r_dec - _HALO
    none = jnp.int32(-_INF)
    _PACK = jnp.int32(pack)

    def absorb_pass(lab, rch, axis, reverse, idx, n):
        packed = jnp.where(rch != 0, idx * _PACK + lab, none)
        near = (_min_scan(-packed, axis, n) * -1 if reverse
                else _max_scan(packed, axis, n))
        dl = near % _PACK
        ok = (near > none // 2) & (rch == 0) \
            & (jnp.abs(dl // gw - aty) <= 1) & (jnp.abs(dl % gw - tx) <= 1)
        return jnp.where(ok, dl, lab), rch | ok.astype(jnp.int32)

    def absorb_body(state):
        lab, rch, _, it = state
        r0 = rch
        lab, rch = absorb_pass(lab, rch, 1, False, coli, lim_w)
        lab, rch = absorb_pass(lab, rch, 1, True, -coli, lim_w)
        lab, rch = absorb_pass(lab, rch, 0, False, rowi, lim_h)
        lab, rch = absorb_pass(lab, rch, 0, True, -rowi, lim_h)
        return lab, rch, jnp.sum(rch - r0), it + 1

    def absorb_cond(state):
        _, _, changed, it = state
        return (changed > 0) & (it < absorb_cap)

    lab, _, _, _ = jax.lax.while_loop(
        absorb_cond, absorb_body, (lab, r, jnp.int32(1), jnp.int32(0)))
    out_ref[0] = lab[_HALO * step:_HALO * step + dec_rows]


@functools.partial(jax.jit, static_argnames=('cfg', 'reach_cap',
                                             'absorb_cap'))
def enforce_fused_pallas(labels_p, centers, cfg: SlicConfig,
                         reach_cap=MAX_SWEEPS, absorb_cap=12):
    """Fused seed+reach+absorb over grid-padded labels.

    :param labels_p: (pad_h, pad_w) int32 labels, out-of-image pixels -9
    :param centers: (K, 2) f32 per-superpixel centroids (y, x)
    :returns: (pad_h, pad_w) int32 enforced labels
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    wp = cfg.pad_w
    r_dec = band_rows_for(gh, step, wp, planes=PLANES_FUSED,
                          budget=VMEM_FUSED)
    n_bands = -(-gh // r_dec)
    dec_rows = r_dec * step
    band_tr = r_dec + 2 * _HALO
    band_rows = band_tr * step

    top = _HALO * step
    bottom = (n_bands * r_dec - gh + _HALO) * step
    lab_full = jnp.pad(labels_p, ((top, bottom), (0, 0)), constant_values=-9)
    lab_bands = _banded(lab_full, n_bands, dec_rows, band_rows)

    # centroid table, tile row ty at index ty+3; bottom padding covers the
    # last band's slice (band_tr+2 rows from n_bands*r_dec onward)
    pad_bot = n_bands * r_dec - gh + 3
    cg = jnp.transpose(
        jnp.asarray(centers, jnp.float32).reshape(gh, gw, 2), (0, 2, 1))
    cg = jnp.concatenate([cg, jnp.zeros((gh, 6, gw), jnp.float32)], axis=1)
    cyx = jnp.concatenate([jnp.zeros((3, 8, gw), jnp.float32), cg,
                           jnp.zeros((pad_bot, 8, gw), jnp.float32)], axis=0)

    pack = 1 << int(gh * gw - 1).bit_length()
    assert max(cfg.pad_h, wp) * pack < 2 ** 31, \
        'image too large for packed scans'

    band_spec = pl.BlockSpec((1, band_rows, wp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_enforce_kernel, cfg=cfg, r_dec=r_dec,
                          band_tr=band_tr, dec_rows=dec_rows, pack=pack,
                          reach_cap=reach_cap, absorb_cap=absorb_cap),
        grid=(n_bands,),
        in_specs=[band_spec,
                  pl.BlockSpec((gh + 3 + pad_bot, 8, gw),
                               lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, dec_rows, wp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands, dec_rows, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_FUSED),
    )(lab_bands, cyx)
    return out.reshape(n_bands * dec_rows, wp)[:cfg.pad_h]
