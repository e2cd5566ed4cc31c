"""Fused Pallas SLIC iteration kernel.

The XLA formulation of SLIC (`pyimsegm_tpu.ops.slic`) materialises nine
upsampled center fields per assign pass and re-scans the pixels for the
update, costing ~50 ms/MPix on one chip.  This kernel fuses assignment and
the update partial-reduction into one pass over the pixels:

* grid = one program per tile row; each program holds its row of pixels
  (``3 x step x wp`` Lab block, channel-first so pixels sit on the natural
  sublane x lane tiles) and the three relevant center rows in VMEM;
* the squared SLIC distance is evaluated in dot-product form
  ``argmin_c |p - c|^2  ==  argmax_c (p . c - |c|^2 / 2)`` on spatially
  pre-scaled 6-vectors ``p = (l, a, b, s*y, s*x, 1)`` /
  ``c = (l, a, b, s*y, s*x, |c|^2/2)`` — 10 VPU ops per candidate instead
  of the ~15 of the explicit difference form;
* all nine candidate-center fields are broadcast in-register with ONE MXU
  matmul (``stacked centers (72, gw) @ selector (gw, wp)``) — the selector
  is a static 0/1 matrix built from iotas, so there are no transposes and
  no HBM intermediates.  The matmuls run at ``Precision.HIGHEST``: the
  default TPU matmul precision rounds multiplicands to bf16, which perturbs
  the |c|^2/2 row (and the pooled coordinate sums) by more than real
  inter-candidate distance gaps — measured as whole superpixels flipping
  and ~px of center jitter.  Full-f32 passes on these tiny matmuls cost
  well under the kernel's VPU time;
* per-offset partial sums (Lab, y, x, count) are pooled per tile column
  with one mirrored selector matmul (``(54, wp) @ (wp, gw)``) instead of
  a scatter.

HBM traffic is pared to the bone: the pixel buffer is bf16 (6 B/px), the
validity mask is recomputed from iotas instead of loaded, and labels are
only written by the final pass (update passes emit just the tiny per-tile
partials) — ~6 B/px per update pass.

The tiny cross-tile combine (shift partials by their offset, divide by
counts) stays in XLA.

SLICO (adaptive per-cluster compactness, skimage ``slic_zero``;
`/root/reference/imsegm/superpixels.py:61`) runs through the same kernels
with ``slico=True``: the distance ``dc2 / M_c + ds2 / step**2`` (per-cluster
color normaliser ``M_c``) stays in dot form by carrying ``1/(2 M_c)`` as an
extra candidate row — the pixel's ``|lab|^2`` term no longer cancels across
candidates, so the score subtracts ``|lab|^2 * f6``.  The per-cluster
``max dc2`` update is an in-kernel segmented max: per-offset masked column
maxima, a lane-butterfly max within each tile column, then the same
selector-matmul pooling as the sums (one nonzero per column).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyimsegm_tpu.ops.slic import SlicConfig

_BIG = 1e10
#: sentinel half-|c|^2 for out-of-grid candidates: score = 0 - _SENT, never wins
_SENT = 1e30
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _slic_pass_kernel(lab_ref, c6_ref, scale_ref, *refs,
                      cfg: SlicConfig, want_labels, want_partials=None,
                      want_features=False, slico=False):
    """One SLIC pass for one tile row.

    lab_ref:      (3, 1, step, wp)  Lab pixels of this tile row
    c6_ref:       (gh+2, 6, gw)    all centers as score 6-vectors
                                   [l, a, b, s*y, s*x, |c|^2/2], 1 sentinel
                                   row of padding on each side;
                                   (gh+2, 8, gw) when ``slico`` — rows
                                   [l/M, a/M, b/M, s*y, s*x, half, 1/(2M),
                                   |c_lab|^2/(2M)] (see module docstring)
    scale_ref:    (1, 1)           s = m/step spatial scale in SMEM
    refs:         optional feature-image input (3, 1, step, wp) f32 when
                  ``want_features``, then the outputs:
                  labels (1, step, wp) winning superpixel id (want_labels),
                  partials (1, 54 or 108, gw) — 9 offsets x [3 Lab, y, x,
                  count] update sums, plus 9 x [3 sum(v), 3 sum(v^2)] color
                  moment sums when ``want_features`` (want_partials).
                  [labels, partials] together form the final fused pass:
                  labels come from the same assignment that feeds the last
                  center update + feature reduction, matching skimage's
                  assign-then-update iteration order.
    """
    if want_partials is None:
        want_partials = not want_labels
    refs = list(refs)
    feat_ref = refs.pop(0) if want_features else None
    if want_labels and want_partials:
        labels_ref, partials_ref = refs
    elif want_labels:
        labels_ref, = refs
    else:
        partials_ref, = refs
    step, gw = cfg.step, cfg.grid_w
    wp = cfg.pad_w
    i = pl.program_id(0)

    # pixels are stored bf16 in HBM (halves the per-iteration read traffic);
    # all arithmetic is f32
    l0 = lab_ref[0, 0].astype(jnp.float32)
    l1 = lab_ref[1, 0].astype(jnp.float32)
    l2 = lab_ref[2, 0].astype(jnp.float32)               # (step, wp)
    s = scale_ref[0, 0]

    # mosaic iota must be integer; cast after
    iy = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0) + i * step
    ix = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1)
    py = iy.astype(jnp.float32)
    px = ix.astype(jnp.float32)
    sy = py * s
    sx = px * s
    # validity recomputed from iotas — no mask plane in HBM
    valid = ((iy < cfg.height) & (ix < cfg.width)).astype(jnp.float32)
    lane_tile = ix // step

    # static selector: sel_field[g, l] = 1 iff lane l belongs to tile col g
    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    sel_field = (g_of_row == l_of_col).astype(jnp.float32)     # (gw, wp)

    nrows = 8 if slico else 6
    crows = c6_ref[pl.ds(i, 3)]                          # (3, nrows, gw)

    # stack all 9 candidate rows (column-shifted per dj; sentinel columns
    # only carry the huge half-|c|^2 term so their score is -_SENT)
    sent_col = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) == 5,
        _SENT, 0.0)                                      # (nrows, 1)
    pad2 = jnp.zeros((8 - nrows, gw), jnp.float32)
    rows = []
    for di, dj in _OFFSETS:
        row = crows[di + 1]                              # (nrows, gw)
        if dj == -1:
            row = jnp.concatenate([sent_col, row[:, :-1]], axis=1)
        elif dj == 1:
            row = jnp.concatenate([row[:, 1:], sent_col], axis=1)
        # pad every offset block to 8 sublanes so the per-offset slices of
        # the matmul result stay on sublane-tile boundaries
        rows.append(jnp.concatenate([row, pad2], axis=0) if nrows < 8
                    else row)
    stacked = jnp.concatenate(rows, axis=0)              # (72, gw)
    fields = jax.lax.dot(stacked, sel_field,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # (72, wp)

    best_s = jnp.full((step, wp), -jnp.inf, jnp.float32)
    best_o = jnp.zeros((step, wp), jnp.int32)
    if want_labels:
        best_l = jnp.zeros((step, wp), jnp.int32)
    if slico:
        plab2 = l0 * l0 + l1 * l1 + l2 * l2

    for oi, (di, dj) in enumerate(_OFFSETS):
        f = fields[8 * oi:8 * oi + 8]                    # (8, wp)
        score = (l0 * f[0:1, :] + l1 * f[1:2, :] + l2 * f[2:3, :]
                 + sy * f[3:4, :] + sx * f[4:5, :] - f[5:6, :])
        if slico:
            # the pixel |lab|^2 / (2 M_c) term varies per candidate
            score = score - plab2 * f[6:7, :]
        take = score > best_s
        best_s = jnp.where(take, score, best_s)
        if want_labels:
            cand = (i + di) * gw + dj + lane_tile
            best_l = jnp.where(take, cand, best_l)
        if want_partials:
            best_o = jnp.where(take, oi, best_o)

    if want_labels:
        labels_ref[0] = best_l
        if not want_partials:
            return

    if want_features:
        v0 = feat_ref[0, 0]
        v1 = feat_ref[1, 0]
        v2 = feat_ref[2, 0]                              # (step, wp) f32
        q0, q1, q2 = v0 * v0, v1 * v1, v2 * v2

    rows = []
    for oi in range(9):
        w = jnp.where(best_o == oi, valid, 0.0)
        rows += [
            jnp.sum(l0 * w, axis=0, keepdims=True),
            jnp.sum(l1 * w, axis=0, keepdims=True),
            jnp.sum(l2 * w, axis=0, keepdims=True),
            jnp.sum(py * w, axis=0, keepdims=True),
            jnp.sum(px * w, axis=0, keepdims=True),
            jnp.sum(w, axis=0, keepdims=True),
        ]
        if want_features:
            rows += [
                jnp.sum(v0 * w, axis=0, keepdims=True),
                jnp.sum(v1 * w, axis=0, keepdims=True),
                jnp.sum(v2 * w, axis=0, keepdims=True),
                jnp.sum(q0 * w, axis=0, keepdims=True),
                jnp.sum(q1 * w, axis=0, keepdims=True),
                jnp.sum(q2 * w, axis=0, keepdims=True),
            ]
    data54 = jnp.concatenate(rows, axis=0)               # (54|108, wp)

    l_of_row = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0) // step
    g_of_col = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    sel_pool = (l_of_row == g_of_col).astype(jnp.float32)      # (wp, gw)
    # full-f32 matmul passes: default TPU precision would round the pooled
    # coordinate sums (magnitude ~1e5) by more than a pixel
    partials_ref[0] = jax.lax.dot(data54, sel_pool,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)


def _multi_update_kernel(lab_ref, c0_ref, scale_ref, out_ref,
                         c6_scr, nsums_scr, *, cfg: SlicConfig,
                         slico=False):
    """All ``n_upd`` SLIC update iterations in ONE kernel.

    Grid is (n_upd, gh) — iterations outer, tile rows inner; TPU grid
    programs run sequentially, so the per-iteration global center update
    is done by the first row program of each iteration from a persistent
    VMEM accumulator.  Versus one ``pallas_call`` per iteration this
    removes 9 kernel launches, the XLA combine between passes, and all
    per-iteration partials round-trips through HBM — only the bf16 pixel
    blocks stream per iteration (auto double-buffered by the grid
    pipeline).

    lab_ref:   (3, 1, step, wp) bf16 Lab pixels of this tile row
    c0_ref:    (gh, 8, gw) f32 initial centers, rows [l, a, b, y, x, 0...]
               (row 5 = initial M = m^2 when ``slico``)
    scale_ref: (1, 1) SMEM f32 — s = m/step (1/step when ``slico``)
    out_ref:   (gh, 8, gw) f32 centers (constant index map: lives in VMEM
               for the whole call, doubles as the running center store;
               row 5 carries the per-cluster SLICO color normaliser M)
    c6_scr:    (gh+2, 8, gw) score 6-vectors + sentinel rows (8-vectors
               with [.., 1/(2M), |c_lab|^2/(2M)] when ``slico``)
    nsums_scr: (gh+2, 8, gw) per-center update sums accumulator (row 6
               max-accumulates the per-cluster max dc2 when ``slico``)
    """
    step, gw, gh = cfg.step, cfg.grid_w, cfg.grid_h
    wp = cfg.pad_w
    t = pl.program_id(0)
    i = pl.program_id(1)
    n_upd = pl.num_programs(0)
    s = scale_ref[0, 0]

    def refresh_c6():
        c = out_ref[...]                                  # (gh, 8, gw)
        cl, ca, cb = c[:, 0], c[:, 1], c[:, 2]
        sy, sx = c[:, 3] * s, c[:, 4] * s
        if slico:
            inv = 1.0 / jnp.maximum(c[:, 5], 1e-6)        # 1 / M_c
            half_col = 0.5 * (cl * cl + ca * ca + cb * cb) * inv
            half = half_col + 0.5 * (sy * sy + sx * sx)
            c6_scr[1:gh + 1] = jnp.concatenate(
                [(cl * inv)[:, None], (ca * inv)[:, None],
                 (cb * inv)[:, None], sy[:, None], sx[:, None],
                 half[:, None], (0.5 * inv)[:, None], half_col[:, None]],
                axis=1)
            return
        half = 0.5 * (cl * cl + ca * ca + cb * cb + sy * sy + sx * sx)
        zero = jnp.zeros((gh, 1, gw), jnp.float32)
        c6_scr[1:gh + 1] = jnp.concatenate(
            [cl[:, None], ca[:, None], cb[:, None], sy[:, None],
             sx[:, None], half[:, None], zero, zero], axis=1)

    def finalize():
        sums = nsums_scr[1:gh + 1]                        # (gh, 8, gw)
        cnt = sums[:, 5:6]
        new = sums / jnp.maximum(cnt, 1.0)
        upd = jnp.where(cnt > 0, new, out_ref[...])
        if slico:
            # M <- max(max-assigned-dc2, 1.0) — unconditional, like the XLA
            # twin (empty clusters get M = 1); rows 6-7 kept zero
            rsel = jax.lax.broadcasted_iota(jnp.int32, (gh, 8, gw), 1)
            mnew = jnp.broadcast_to(jnp.maximum(sums[:, 6:7], 1.0),
                                    (gh, 8, gw))
            upd = jnp.where(rsel == 5, mnew,
                            jnp.where(rsel > 5, 0.0, upd))
        out_ref[...] = upd

    @pl.when(i == 0)
    def _():
        @pl.when(t == 0)
        def _():
            out_ref[...] = c0_ref[...]
            # sentinel rows: score contribution -_SENT, never wins
            # (iota mask — Pallas TPU has no scatter for .at[].set)
            comp = jax.lax.broadcasted_iota(jnp.int32, (1, 8, gw), 1)
            sent = jnp.where(comp == 5, _SENT, 0.0)
            c6_scr[0:1] = sent
            c6_scr[gh + 1:gh + 2] = sent

        @pl.when(t > 0)
        def _():
            finalize()
        refresh_c6()
        nsums_scr[1:gh + 1] = jnp.zeros((gh, 8, gw), jnp.float32)

    # ---- assignment (same dot-form scoring as _slic_pass_kernel) ----
    l0 = lab_ref[0, 0].astype(jnp.float32)
    l1 = lab_ref[1, 0].astype(jnp.float32)
    l2 = lab_ref[2, 0].astype(jnp.float32)                # (step, wp)

    iy = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 0) + i * step
    ix = jax.lax.broadcasted_iota(jnp.int32, (step, wp), 1)
    py = iy.astype(jnp.float32)
    px = ix.astype(jnp.float32)
    sy = py * s
    sx = px * s
    valid = ((iy < cfg.height) & (ix < cfg.width)).astype(jnp.float32)

    g_of_row = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 0)
    l_of_col = jax.lax.broadcasted_iota(jnp.int32, (gw, wp), 1) // step
    sel_field = (g_of_row == l_of_col).astype(jnp.float32)      # (gw, wp)

    crows = c6_scr[pl.ds(i, 3)]                           # (3, 8, gw)

    sent_col = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 5, _SENT, 0.0)
    rows = []
    for di, dj in _OFFSETS:
        row = crows[di + 1]                               # (8, gw)
        if dj == -1:
            row = jnp.concatenate([sent_col, row[:, :-1]], axis=1)
        elif dj == 1:
            row = jnp.concatenate([row[:, 1:], sent_col], axis=1)
        rows.append(row)
    stacked = jnp.concatenate(rows, axis=0)               # (72, gw)
    fields = jax.lax.dot(stacked, sel_field,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # (72, wp)

    best_s = jnp.full((step, wp), -jnp.inf, jnp.float32)
    best_o = jnp.zeros((step, wp), jnp.int32)
    if slico:
        plab2 = l0 * l0 + l1 * l1 + l2 * l2
        best_dc2 = jnp.zeros((step, wp), jnp.float32)
    for oi in range(9):
        f = fields[8 * oi:8 * oi + 8]
        cdot = l0 * f[0:1, :] + l1 * f[1:2, :] + l2 * f[2:3, :]
        score = cdot + sy * f[3:4, :] + sx * f[4:5, :] - f[5:6, :]
        if slico:
            score = score - plab2 * f[6:7, :]
        take = score > best_s
        best_s = jnp.where(take, score, best_s)
        best_o = jnp.where(take, oi, best_o)
        if slico:
            # recover the winner's color distance for the M_c update:
            # dc2/M = 2*(f6*|p|^2 - p.(c/M) + |c|^2/(2M)); M = 1/(2*f6)
            # (sentinel f6 = 0 divides to inf/nan but is never taken)
            dc2 = (f[6:7, :] * plab2 - cdot + f[7:8, :]) / f[6:7, :]
            best_dc2 = jnp.where(take, dc2, best_dc2)

    # ---- per-offset partial sums, grouped by dj so the pooling matmul
    # also applies the column shift (sel maps lane-tile -> tile + dj) ----
    l_of_row = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 0) // step
    g_of_col = jax.lax.broadcasted_iota(jnp.int32, (wp, gw), 1)
    accs = [jnp.zeros((8, gw), jnp.float32) for _ in range(3)]
    for dj in (-1, 0, 1):
        rows = []
        for di in (-1, 0, 1):
            oi = (di + 1) * 3 + (dj + 1)
            w = jnp.where(best_o == oi, valid, 0.0)
            rows += [
                jnp.sum(l0 * w, axis=0, keepdims=True),
                jnp.sum(l1 * w, axis=0, keepdims=True),
                jnp.sum(l2 * w, axis=0, keepdims=True),
                jnp.sum(py * w, axis=0, keepdims=True),
                jnp.sum(px * w, axis=0, keepdims=True),
                jnp.sum(w, axis=0, keepdims=True),
                jnp.zeros((2, wp), jnp.float32),
            ]
        data24 = jnp.concatenate(rows, axis=0)            # (24, wp)
        sel_pool = (l_of_row + dj == g_of_col).astype(jnp.float32)
        pooled = jax.lax.dot(data24, sel_pool,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)  # (24, gw)
        for k in range(3):
            accs[k] = accs[k] + pooled[8 * k:8 * k + 8]

    if slico:
        # ---- per-cluster max dc2 (segmented max; no scatter, no matmul
        # trick works for max so: sublane max -> lane butterfly within each
        # tile column -> selector matmul over the single surviving lane) ----
        mrows = []
        for oi in range(9):
            w = jnp.where((best_o == oi) & (valid > 0), best_dc2, 0.0)
            mrows.append(jnp.max(w, axis=0, keepdims=True))
        md = jnp.concatenate(
            mrows + [jnp.zeros((7, wp), jnp.float32)], axis=0)  # (16, wp)
        lane = jax.lax.broadcasted_iota(jnp.int32, (16, wp), 1)
        off = 1
        while off < step:
            same = (lane // step) == ((lane + off) // step)
            md = jnp.where(same,
                           jnp.maximum(md, jnp.roll(md, -off, axis=1)), md)
            off *= 2
        md = jnp.where(lane % step == 0, md, 0.0)
        sel0 = (l_of_row == g_of_col).astype(jnp.float32)
        mpool = jax.lax.dot(md, sel0,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)  # (16, gw)

        def shift_g(row, dj):
            # target column = tile + dj: shifted[:, c] = row[:, c - dj]
            # roll+mask instead of concatenate: Mosaic's vector lowering
            # rejects the degenerate (1,1)+(1,gw-1) lane concat at some
            # grid widths (observed at gw=16 on the r5 toolchain)
            if dj == 0:
                return row
            n = row.shape[1]
            rolled = pltpu.roll(row, dj % n, 1)
            idx = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
            keep = idx >= dj if dj >= 0 else idx < n + dj
            return jnp.where(keep, rolled, 0.0)

        maxblks = []
        for di in (-1, 0, 1):
            mrow = jnp.zeros((1, gw), jnp.float32)
            for dj in (-1, 0, 1):
                oi = (di + 1) * 3 + (dj + 1)
                mrow = jnp.maximum(mrow, shift_g(mpool[oi:oi + 1], dj))
            maxblks.append(jnp.concatenate(
                [jnp.zeros((6, gw), jnp.float32), mrow,
                 jnp.zeros((1, gw), jnp.float32)], axis=0))       # (8, gw)

    for k, di in enumerate((-1, 0, 1)):
        row = i + di + 1
        cur = nsums_scr[pl.ds(row, 1)]
        upd = cur + accs[k][None]
        if slico:
            rsel = jax.lax.broadcasted_iota(jnp.int32, (1, 8, gw), 1)
            upd = jnp.where(rsel == 6,
                            jnp.maximum(cur, maxblks[k][None]), upd)
        nsums_scr[pl.ds(row, 1)] = upd

    # last program finalizes the last iteration's centers
    @pl.when((t == n_upd - 1) & (i == gh - 1))
    def _():
        finalize()


@functools.partial(jax.jit, static_argnames=('cfg', 'n_upd', 'slico'))
def slic_multi_update_pallas(lab_chw, centers, spatial_w2, cfg: SlicConfig,
                             n_upd, slico=False, init_m2=None):
    """Run ``n_upd`` fused assign+update iterations; returns new centers.

    :param lab_chw: (3, pad_h, pad_w) Lab pixels (bf16 ok)
    :param centers: (gh, gw, 5) float32 [l, a, b, y, x]
    :param spatial_w2: scalar (m/step)^2 spatial weight factor
        (1/step^2 when ``slico``)
    :param slico: adaptive per-cluster compactness (skimage ``slic_zero``);
        ``init_m2`` (scalar m^2) seeds the per-cluster color normaliser
    :returns: (gh, gw, 5) float32 updated centers — (gh, gw, 6) with the
        final per-cluster M in column 5 when ``slico``
    """
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    if slico:
        m2col = jnp.broadcast_to(
            jnp.asarray(init_m2, jnp.float32).reshape(1, 1, 1), (gh, 1, gw))
    if n_upd <= 0:
        if not slico:
            return centers
        return jnp.concatenate(
            [centers, jnp.transpose(m2col, (0, 2, 1))], axis=-1)
    s = jnp.sqrt(jnp.asarray(spatial_w2, jnp.float32))
    pad = jnp.zeros((gh, 2, gw), jnp.float32)
    if slico:
        mid = [m2col, pad]
    else:
        mid = [jnp.zeros((gh, 3, gw), jnp.float32)]
    c0 = jnp.concatenate(
        [jnp.transpose(centers, (0, 2, 1))] + mid, axis=1)  # (gh, 8, gw)
    scale = s.reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_multi_update_kernel, cfg=cfg, slico=slico),
        grid=(n_upd, gh),
        in_specs=[
            pl.BlockSpec((3, 1, step, cfg.pad_w), lambda t, i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, 8, gw), lambda t, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((gh, 8, gw), lambda t, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh, 8, gw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((gh + 2, 8, gw), jnp.float32),
            pltpu.VMEM((gh + 2, 8, gw), jnp.float32),
        ],
    )(lab_chw.reshape(3, gh, step, cfg.pad_w), c0, scale)
    return jnp.transpose(out, (0, 2, 1))[..., :6 if slico else 5]


def _centers_to_score6(centers, s, gw):
    """(gh, gw, 5) centers -> sentinel-padded (gh+2, 6, gw) score 6-vectors."""
    cl, ca, cb = centers[..., 0], centers[..., 1], centers[..., 2]
    sy = centers[..., 3] * s
    sx = centers[..., 4] * s
    half = 0.5 * (cl * cl + ca * ca + cb * cb + sy * sy + sx * sx)
    c6 = jnp.stack([cl, ca, cb, sy, sx, half], axis=1)   # (gh, 6, gw)
    sent = jnp.concatenate(
        [jnp.zeros((1, 5, gw), jnp.float32),
         jnp.full((1, 1, gw), _SENT, jnp.float32)], axis=1)
    return jnp.concatenate([sent, c6, sent], axis=0)


def _centers_to_score8_slico(centers, s, gw):
    """(gh, gw, 6) centers+M -> sentinel-padded (gh+2, 8, gw) SLICO score
    8-vectors [l/M, a/M, b/M, s*y, s*x, half, 1/(2M), |c_lab|^2/(2M)]
    (same formulation as the in-kernel ``refresh_c6``)."""
    cl, ca, cb = centers[..., 0], centers[..., 1], centers[..., 2]
    sy = centers[..., 3] * s
    sx = centers[..., 4] * s
    inv = 1.0 / jnp.maximum(centers[..., 5], 1e-6)
    half_col = 0.5 * (cl * cl + ca * ca + cb * cb) * inv
    half = half_col + 0.5 * (sy * sy + sx * sx)
    c8 = jnp.stack([cl * inv, ca * inv, cb * inv, sy, sx, half,
                    0.5 * inv, half_col], axis=1)        # (gh, 8, gw)
    sent = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 8, gw), 1) == 5, _SENT, 0.0)
    return jnp.concatenate([sent, c8, sent], axis=0)


def _pallas_pass(lab_chw, centers, spatial_w2, cfg: SlicConfig,
                 want_labels, want_partials=None, feat_chw=None,
                 slico=False):
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    if want_partials is None:
        want_partials = not want_labels
    want_features = feat_chw is not None
    s = jnp.sqrt(jnp.asarray(spatial_w2, jnp.float32))
    centers_pad = (_centers_to_score8_slico(centers, s, gw) if slico
                   else _centers_to_score6(centers, s, gw))
    scale = s.reshape(1, 1)

    n_rows = 108 if want_features else 54
    labels_spec = pl.BlockSpec((1, step, cfg.pad_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    labels_shape = jax.ShapeDtypeStruct((gh, step, cfg.pad_w), jnp.int32)
    partials_spec = pl.BlockSpec((1, n_rows, gw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    partials_shape = jax.ShapeDtypeStruct((gh, n_rows, gw), jnp.float32)
    if want_labels and want_partials:
        out_spec = [labels_spec, partials_spec]
        out_shape = [labels_shape, partials_shape]
    elif want_labels:
        out_spec, out_shape = labels_spec, labels_shape
    else:
        out_spec, out_shape = partials_spec, partials_shape

    in_specs = [
        # 4D layout (3, gh, step, wp): the last two block dims equal the
        # array dims, satisfying the TPU (8, 128)-divisibility rule for
        # the non-multiple tile size `step`
        pl.BlockSpec((3, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gh + 2, 8 if slico else 6, gw), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [lab_chw.reshape(3, gh, step, cfg.pad_w), centers_pad, scale]
    if want_features:
        in_specs.append(
            pl.BlockSpec((3, 1, step, cfg.pad_w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(feat_chw.reshape(3, gh, step, cfg.pad_w))

    return pl.pallas_call(
        functools.partial(_slic_pass_kernel, cfg=cfg,
                          want_labels=want_labels,
                          want_partials=want_partials,
                          want_features=want_features,
                          slico=slico),
        grid=(gh,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
    )(*operands)


@functools.partial(jax.jit, static_argnames=('cfg',))
def slic_update_labels_pallas(lab_chw, centers, spatial_w2, cfg: SlicConfig,
                              feat_chw=None):
    """Fused final pass: labels AND update partials from one assignment,
    optionally with per-superpixel color moment sums of ``feat_chw``.

    :returns: (labels (pad_h, pad_w) int32, partials (gh, gw, 9, 6 or 12))
    """
    labels, partials = _pallas_pass(lab_chw, centers, spatial_w2, cfg,
                                    want_labels=True, want_partials=True,
                                    feat_chw=feat_chw)
    ch = partials.shape[1] // 9
    partials = jnp.transpose(
        partials.reshape(cfg.grid_h, 9, ch, cfg.grid_w), (0, 3, 1, 2))
    return labels.reshape(cfg.pad_h, cfg.pad_w), partials


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


@functools.partial(jax.jit, static_argnames=('cfg', 'slico'))
def slic_assign_pallas(lab_chw, centers, spatial_w2, cfg: SlicConfig,
                       slico=False):
    """Final assignment pass: (pad_h, pad_w) int32 labels.

    With ``slico`` the centers must carry the per-cluster color
    normaliser M in column 5 ((gh, gw, 6), from
    :func:`slic_multi_update_pallas` ``slico=True``)."""
    labels = _pallas_pass(lab_chw, centers, spatial_w2, cfg,
                          want_labels=True, slico=slico)
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


def combine_sums(partials):
    """Shift per-offset partials to their target seed and sum.

    :param partials: (gh, gw, 9, CH) — CH = 6 update sums, optionally +6
        color moment sums
    :returns: (gh, gw, CH) per-seed sums ([3 Lab, y, x, count, ...])
    """
    gh, gw = partials.shape[:2]
    sums = jnp.zeros((gh, gw, partials.shape[-1]), jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        part = partials[:, :, oi]
        pad = [(max(di, 0), max(-di, 0)), (max(dj, 0), max(-dj, 0)), (0, 0)]
        shifted = jnp.pad(part, pad)[max(-di, 0):max(-di, 0) + gh,
                                     max(-dj, 0):max(-dj, 0) + gw]
        sums = sums + shifted
    return sums


def combine_partials(partials, centers):
    """Per-seed mean update from partials; empty clusters keep old centers.

    :param partials: (gh, gw, 9, 6)
    :param centers: (gh, gw, 5) previous centers (kept where cluster empty)
    :returns: (gh, gw, 5) new centers
    """
    sums = combine_sums(partials)
    cnt = sums[..., 5:6]
    new = sums[..., :5] / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt > 0, new, centers)
