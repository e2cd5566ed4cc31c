"""Sharded SLIC: one image tiled across chips (the "long-context" axis).

The reference holds whole images in RAM and has no tiling story
(`SURVEY.md` §5); images larger than one chip's HBM need the superpixel
clustering itself distributed.  Design (the ring-attention analog for
clustering): the pixel rows are sharded over the mesh, the center table
(K x 6 floats — tiny) is replicated, and each SLIC iteration does

1. local assignment of the shard's pixels against the replicated centers
   (each pixel only looks at its tile's 3x3 center neighbourhood);
2. local partial center sums (scatter-free masked tile reductions);
3. ONE ``psum`` over the mesh of the (gh+2, gw, 6) partial table — the only
   inter-chip traffic, a few KB per iteration over ICI.

The final label map stays sharded with the pixels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops.slic import (
    SlicConfig,
    _BIG,
    _prepare_image,
    _upsample_grid,
    compactness_from_regul,
    slic_config,
)

_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _shard_rows(cfg: SlicConfig, n_devices):
    """Local tile-row count; grid rows must split evenly over devices."""
    if cfg.grid_h % n_devices != 0:
        raise ValueError('grid rows (%i) must be divisible by devices (%i); '
                         'pick sp_size or pad accordingly'
                         % (cfg.grid_h, n_devices))
    return cfg.grid_h // n_devices


def _local_slic_iter(lab_loc, valid_loc, centers, cfg: SlicConfig, lgh,
                     spatial_w2, axis_name):
    """One assignment + local partial sums + psum'd center update."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    wp = cfg.pad_w
    hb = lgh * step                                     # local pixel rows
    idx = jax.lax.axis_index(axis_name)
    t0 = idx * lgh                                      # first global tile row

    # replicated centers with one sentinel row each side; local halo slice
    sent = jnp.full((1, gw, 5), _BIG, jnp.float32)
    cent_pad = jnp.concatenate([sent, centers, sent], axis=0)
    halo = jax.lax.dynamic_slice(cent_pad, (t0, 0, 0), (lgh + 2, gw, 5))

    py = (jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 0)
          + (t0 * step).astype(jnp.float32))
    px = jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 1)

    ty_loc = jax.lax.broadcasted_iota(jnp.int32, (lgh, gw), 0)
    tx = jax.lax.broadcasted_iota(jnp.int32, (lgh, gw), 1)

    def _shift_cols(grid, dj):
        # out[:, x] = grid[:, x + dj]  (neighbour gather, like roll by -dj)
        pad = [(0, 0), (max(-dj, 0), max(dj, 0))] + [(0, 0)] * (grid.ndim - 2)
        padded = jnp.pad(grid, pad, constant_values=_BIG)
        return padded[:, max(dj, 0):max(dj, 0) + gw]

    best_d = jnp.full((hb, wp), _BIG, jnp.float32)
    best_o = jnp.zeros((hb, wp), jnp.int8)
    best_lb = jnp.zeros((hb, wp), jnp.int32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        nb = _shift_cols(halo[1 + di:1 + di + lgh], dj)     # (lgh, gw, 5)
        sy = t0 + ty_loc + di
        sx = tx + dj
        inb = (sy >= 0) & (sy < gh) & (sx >= 0) & (sx < gw)
        nb = jnp.where(inb[..., None], nb, _BIG)
        nb_id = jnp.where(inb, sy * gw + sx, 0).astype(jnp.int32)
        cfield = _upsample_grid(nb, step)                   # (hb, wp, 5)
        lbf = _upsample_grid(nb_id[..., None].astype(jnp.float32),
                             step)[..., 0].astype(jnp.int32)
        dc2 = jnp.sum((lab_loc - cfield[..., :3]) ** 2, axis=-1)
        ds2 = (py - cfield[..., 3]) ** 2 + (px - cfield[..., 4]) ** 2
        d = dc2 + ds2 * spatial_w2
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_o = jnp.where(take, jnp.int8(oi), best_o)
        best_lb = jnp.where(take, lbf, best_lb)

    # local partial sums routed to haloed rows, then one psum
    data = jnp.concatenate([lab_loc, py[..., None], px[..., None],
                            jnp.ones((hb, wp, 1), jnp.float32)], axis=-1) \
        * valid_loc[..., None]
    part_halo = jnp.zeros((lgh + 2, gw, 6), jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        mask = (best_o == oi).astype(jnp.float32)[..., None]
        part = (data * mask).reshape(lgh, step, gw, step, 6).sum(axis=(1, 3))
        pad = [(1 + di, 1 - di), (max(dj, 0), max(-dj, 0)), (0, 0)]
        shifted = jnp.pad(part, pad)[:, max(-dj, 0):max(-dj, 0) + gw]
        part_halo = part_halo + shifted

    sums_global = jnp.zeros((gh + 2, gw, 6), jnp.float32)
    sums_global = jax.lax.dynamic_update_slice(sums_global, part_halo,
                                               (t0, 0, 0))
    sums_global = jax.lax.psum(sums_global, axis_name)      # the only collective
    sums = sums_global[1:gh + 1]
    cnt = sums[..., 5:6]
    new_centers = jnp.where(cnt > 0, sums[..., :5] / jnp.maximum(cnt, 1.0),
                            centers)
    return best_lb, new_centers


@functools.partial(jax.jit, static_argnames=('cfg', 'n_iter', 'axis_name',
                                             'lgh'))
def _slic_sharded_shard(lab_loc, valid_loc, centers0, spatial_w2,
                        cfg: SlicConfig, lgh, n_iter, axis_name):
    def body(_, centers):
        _lbl, centers = _local_slic_iter(lab_loc, valid_loc, centers, cfg,
                                         lgh, spatial_w2, axis_name)
        return centers

    # n_iter-1 update rounds + final assignment (skimage iteration order,
    # matching ops/slic.py)
    centers = jax.lax.fori_loop(0, max(n_iter - 1, 0), body, centers0)
    labels, _ = _local_slic_iter(lab_loc, valid_loc, centers, cfg, lgh,
                                 spatial_w2, axis_name)
    return labels


def slic_segment_sharded(image, sp_size, sp_regul, mesh=None, n_iter=10,
                         axis_name='rows'):
    """Distributed SLIC of one large image over a device mesh.

    :param image: (H, W, 3) float array
    :param mesh: 1D `jax.sharding.Mesh`; defaults to all devices
    :returns: (H, W) int32 labels (host numpy)
    """
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, (axis_name,))
    n_dev = mesh.shape[axis_name]
    image = jnp.asarray(image)
    cfg = slic_config(image.shape[0], image.shape[1], sp_size)
    lgh = _shard_rows(cfg, n_dev)
    m = compactness_from_regul(sp_size, sp_regul)
    sw2 = (jnp.asarray(m, jnp.float32) / cfg.step) ** 2

    # replicated preprocessing (cheap); pixels then shard by rows
    lab = _prepare_image(image)
    ph, pw = cfg.pad_h - cfg.height, cfg.pad_w - cfg.width
    # same bf16 quantisation as ops/slic.py for BOTH the pixel buffer and
    # the sampled seed colors (`_seed_centers` samples the bf16 planes), so
    # sharded and single-device paths assign from identical values
    lab_p = jnp.pad(lab, [(0, ph), (0, pw), (0, 0)], mode='edge')
    lab_p = lab_p.astype(jnp.bfloat16).astype(jnp.float32)
    valid = jnp.pad(jnp.ones((cfg.height, cfg.width), jnp.float32),
                    [(0, ph), (0, pw)])
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    cy0 = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * step - 0.5
    cx0 = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * step - 0.5
    iy = jnp.clip(cy0.astype(jnp.int32), 0, cfg.height - 1)
    ix = jnp.clip(cx0.astype(jnp.int32), 0, cfg.width - 1)
    init_color = lab[iy][:, ix].astype(jnp.bfloat16).astype(jnp.float32)
    cyg, cxg = jnp.meshgrid(cy0, cx0, indexing='ij')
    centers0 = jnp.concatenate([init_color, cyg[..., None], cxg[..., None]],
                               axis=-1)

    fn = shard_map(
        functools.partial(_slic_sharded_shard, cfg=cfg, lgh=lgh,
                          n_iter=n_iter, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P()),
        out_specs=P(axis_name))
    labels = jax.jit(fn)(lab_p, valid, centers0, sw2)
    return np.asarray(labels)[:cfg.height, :cfg.width]


# ===================================================================
# full tiled pipeline: SLIC -> connectivity -> features -> model ->
# adjacency/edge weights -> MRF, one huge image sharded by pixel rows.
#
# Per-pixel stages stay sharded; every per-superpixel table (centers,
# moments, adjacency — a few hundred KB at most) is reduced with ONE
# psum/pmin over ICI and the superpixel-level stages (GMM fit, edge
# weights, the grid MRF solve) then run replicated on each device:
# at K ~ 10^3-10^4 nodes their FLOPs are negligible, and replicating
# them costs zero extra collectives.  The connectivity pass is the
# only iterative sharded stage — it exchanges one boundary pixel row
# per step over ICI (ppermute), the ring-attention-style halo.
# ===================================================================

_CONN4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _row_exchange(row_last, row_first, axis_name, n_dev, fill):
    """Give every shard its neighbours' boundary rows: returns
    (row_above, row_below) where ``row_above`` is the upper neighbour's last
    row and ``row_below`` the lower neighbour's first row (``fill`` at the
    mesh edges)."""
    idx = jax.lax.axis_index(axis_name)
    above = jax.lax.ppermute(row_last, axis_name,
                             [(i, i + 1) for i in range(n_dev - 1)])
    below = jax.lax.ppermute(row_first, axis_name,
                             [(i, i - 1) for i in range(1, n_dev)])
    above = jnp.where(idx == 0, fill, above)
    below = jnp.where(idx == n_dev - 1, fill, below)
    return above, below


def _local_offsets(labels_loc, cfg: SlicConfig, lgh, t0):
    """Per-pixel 3x3 routing offset of each label w.r.t. its global tile;
    returns (off (hb, wp) in [0, 9), ok mask)."""
    gw, step = cfg.grid_w, cfg.step
    hb, wp = labels_loc.shape
    ty = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0) // step + t0
    tx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1) // step
    dy = labels_loc // gw - ty + 1
    dx = labels_loc % gw - tx + 1
    ok = (labels_loc >= 0) & (dy >= 0) & (dy < 3) & (dx >= 0) & (dx < 3)
    return jnp.where(ok, dy * 3 + dx, -1), ok


def _route_halo(parts, di, dj, gw):
    """Shift a (lgh, gw, F) per-tile partial into the (lgh+2, gw, F) halo
    frame at grid offset (di, dj) (zero fill)."""
    pad = [(1 + di, 1 - di), (max(dj, 0), max(-dj, 0))] \
        + [(0, 0)] * (parts.ndim - 2)
    return jnp.pad(parts, pad)[:, max(-dj, 0):max(-dj, 0) + gw]


def _psum_halo(part_halo, cfg: SlicConfig, t0, axis_name):
    """Place a local (lgh+2, gw, F) halo table into the global frame and
    reduce over the mesh; returns (gh, gw, F)."""
    gh, gw = cfg.grid_h, cfg.grid_w
    f = part_halo.shape[-1]
    glob = jnp.zeros((gh + 2, gw, f), jnp.float32)
    glob = jax.lax.dynamic_update_slice(glob, part_halo, (t0, 0, 0))
    return jax.lax.psum(glob, axis_name)[1:gh + 1]


def _local_segment_sum(data_loc, labels_loc, cfg: SlicConfig, lgh, t0,
                       axis_name):
    """(K, F) per-superpixel sums of sharded pixel data (one psum)."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    f = data_loc.shape[-1]
    off, ok = _local_offsets(labels_loc, cfg, lgh, t0)
    part_halo = jnp.zeros((lgh + 2, gw, f), jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        mask = (off == oi).astype(jnp.float32)[..., None]
        part = (data_loc * mask).reshape(lgh, step, gw, step, f).sum((1, 3))
        part_halo = part_halo + _route_halo(part, di, dj, gw)
    return _psum_halo(part_halo, cfg, t0, axis_name).reshape(gh * gw, f)


def _local_segment_min(value_loc, labels_loc, cfg: SlicConfig, lgh, t0,
                       axis_name):
    """(K,) per-superpixel minimum of a sharded pixel map (one pmin)."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    off, ok = _local_offsets(labels_loc, cfg, lgh, t0)
    part_halo = jnp.full((lgh + 2, gw), jnp.inf, jnp.float32)
    for oi, (di, dj) in enumerate(_OFFSETS):
        part = jnp.where(off == oi, value_loc, jnp.inf) \
            .reshape(lgh, step, gw, step).min((1, 3))
        pad = [(1 + di, 1 - di), (max(dj, 0), max(-dj, 0))]
        shifted = jnp.pad(part, pad, constant_values=jnp.inf)[
            :, max(-dj, 0):max(-dj, 0) + gw]
        part_halo = jnp.minimum(part_halo, shifted)
    glob = jnp.full((gh + 2, gw), jnp.inf, jnp.float32)
    glob = jax.lax.dynamic_update_slice(glob, part_halo, (t0, 0))
    return jax.lax.pmin(glob, axis_name)[1:gh + 1].reshape(gh * gw)


def _local_table_lookup(table, labels_loc, cfg: SlicConfig, lgh, t0):
    """Per-pixel ``table[label]`` on a shard without gathers: stack the 3x3
    neighbour values of the replicated (K, C) table, slice the local tile
    rows, one-hot select per pixel."""
    from pyimsegm_tpu.ops.grid import _shift2d
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    hb, wp = labels_loc.shape
    c = table.shape[-1]
    tgrid = table.reshape(gh, gw, c).astype(jnp.float32)
    t9 = jnp.stack([_shift2d(tgrid, -di, -dj) for di, dj in _OFFSETS], axis=2)
    t9_loc = jax.lax.dynamic_slice(t9, (t0, 0, 0, 0), (lgh, gw, 9, c))
    off, ok = _local_offsets(labels_loc, cfg, lgh, t0)
    onehot = jax.nn.one_hot(jnp.where(ok, off, 0), 9, dtype=jnp.float32) \
        * ok[..., None].astype(jnp.float32)
    o_t = onehot.reshape(lgh, step, gw, step, 9).transpose(0, 2, 1, 3, 4) \
        .reshape(lgh * gw, step * step, 9)
    out = jnp.einsum('tpo,toc->tpc', o_t, t9_loc.reshape(lgh * gw, 9, c),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lgh, gw, step, step, c).transpose(0, 2, 1, 3, 4) \
        .reshape(hb, wp, c)


def _local_enforce_connectivity(labels_loc, cfg: SlicConfig, lgh, t0,
                                axis_name, n_dev):
    """Sharded analog of ``ops.grid.enforce_grid_connectivity``: anchors at
    the per-superpixel min-distance-to-centroid pixel (one psum + one pmin),
    then reach/absorb propagation exchanging one boundary pixel row per
    iteration over ICI."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    hb, wp = labels_loc.shape

    py = (jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 0)
          + (t0 * step).astype(jnp.float32))
    px = jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 1)
    geo = jnp.stack([jnp.ones((hb, wp), jnp.float32), py, px], axis=-1)
    sums = _local_segment_sum(geo, labels_loc, cfg, lgh, t0, axis_name)
    cyx = sums[:, 1:3] / jnp.maximum(sums[:, 0:1], 1.0)
    cpix = _local_table_lookup(cyx, labels_loc, cfg, lgh, t0)
    d2 = (py - cpix[..., 0]) ** 2 + (px - cpix[..., 1]) ** 2
    d2min = _local_segment_min(d2, labels_loc, cfg, lgh, t0, axis_name)
    dmin_pix = _local_table_lookup(d2min[:, None], labels_loc, cfg,
                                   lgh, t0)[..., 0]
    reached0 = (d2 <= dmin_pix + 1e-3) & (labels_loc >= 0)

    def _pad_rows(arr, above, below):
        return jnp.concatenate([above[None], arr, below[None]], axis=0)

    def _nbr(pad2, di, dj, fill):
        sl = pad2[1 + di:1 + di + hb]
        padc = jnp.pad(sl, ((0, 0), (max(-dj, 0), max(dj, 0))),
                       constant_values=fill)
        return padc[:, max(dj, 0):max(dj, 0) + wp]

    # reach: labels static, exchange reached rows per step
    la, lb_ = _row_exchange(labels_loc[-1], labels_loc[0], axis_name, n_dev,
                            jnp.int32(-1))
    lab_pad = _pad_rows(labels_loc, la, lb_)

    # (seed = anchor only, matching ops.grid._connect_components and the
    # fused kernel: enforcement leaves every superpixel a single
    # 4-connected region — the round-3 "core seeding" survival rule was
    # reverted everywhere, keeping sharded == single-chip bit-equal)

    def reach_body(state):
        reached, _, it = state
        ra, rb = _row_exchange(reached[-1], reached[0], axis_name, n_dev,
                               jnp.bool_(False))
        rch_pad = _pad_rows(reached, ra, rb)
        new = reached
        for di, dj in _CONN4:
            same = _nbr(lab_pad, di, dj, -1) == labels_loc
            new = new | (_nbr(rch_pad, di, dj, False) & same)
        changed = jax.lax.psum(
            jnp.any(new != reached).astype(jnp.float32), axis_name) > 0
        return new, changed, it + 1

    reached, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < 4 * step),
        reach_body, (reached0, jnp.bool_(True), 0))

    # absorb: labels mutate, exchange both per step
    labels_loc = _local_absorb_unreached(labels_loc, reached, cfg, t0,
                                         axis_name, n_dev)

    # min-size merge (skimage semantics): identical replicated donor tables
    # as the batch path's ops.grid.min_size_merge, so sharded and single-chip
    # pipelines take the same merge decisions (same int() floor, same
    # counts9-gated all-or-nothing chains)
    from pyimsegm_tpu.ops.grid import (_shift2d, donor_chain_table,
                                       sym_contact_counts)
    min_size = int(0.5 * step * step)
    ty = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0) // step + t0
    tx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1) // step
    off9, _ok9 = _local_offsets(labels_loc, cfg, lgh, t0)
    counts9_loc = jnp.stack(
        [jnp.where(off9 == oi, 1.0, 0.0)
         .reshape(lgh, step, gw, step).sum(axis=(1, 3)) for oi in range(9)],
        axis=-1)
    counts9 = jax.lax.psum(jax.lax.dynamic_update_slice(
        jnp.zeros((gh, gw, 9), jnp.float32), counts9_loc, (t0, 0, 0)),
        axis_name)
    counts_g = jnp.zeros((gh, gw), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        counts_g = counts_g + _shift2d(counts9[:, :, idx], di, dj)
    counts = counts_g.reshape(gh * gw)
    raw = _local_pair_counts(labels_loc, cfg, lgh, t0, axis_name, n_dev)
    sym25 = sym_contact_counts(raw, gh, gw)
    donor = donor_chain_table(counts, sym25, gh, gw, min_size,
                              counts9=counts9)
    new = _local_table_lookup(donor[:, None].astype(jnp.float32),
                              labels_loc, cfg, lgh, t0)[..., 0]
    new = jnp.round(new).astype(jnp.int32)
    ok = (jnp.abs(new // gw - ty) <= 1) & (jnp.abs(new % gw - tx) <= 1)
    return jnp.where(ok, new, labels_loc)


def _local_absorb_unreached(labels_loc, reached, cfg: SlicConfig, t0,
                            axis_name, n_dev):
    """Sharded absorb: unreached pixels adopt an adjacent reached label
    (within their 3x3 seed window), one boundary-row exchange per step."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    hb, wp = labels_loc.shape
    ty = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0) // step + t0
    tx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1) // step

    def _pad_rows(arr, above, below):
        return jnp.concatenate([above[None], arr, below[None]], axis=0)

    def _nbr(pad2, di, dj, fill):
        sl = pad2[1 + di:1 + di + hb]
        padc = jnp.pad(sl, ((0, 0), (max(-dj, 0), max(dj, 0))),
                       constant_values=fill)
        return padc[:, max(dj, 0):max(dj, 0) + wp]

    def absorb_body(state):
        labels, reached, _, it = state
        la, lb_ = _row_exchange(labels[-1], labels[0], axis_name, n_dev,
                                jnp.int32(-1))
        ra, rb = _row_exchange(reached[-1], reached[0], axis_name, n_dev,
                               jnp.bool_(False))
        lab_pad = _pad_rows(labels, la, lb_)
        rch_pad = _pad_rows(reached, ra, rb)
        got = reached
        best = labels
        for di, dj in _CONN4:
            nl = _nbr(lab_pad, di, dj, -1)
            nr = _nbr(rch_pad, di, dj, False)
            in_win = (jnp.abs(nl // gw - ty) <= 1) \
                & (jnp.abs(nl % gw - tx) <= 1) & (nl >= 0)
            take = nr & ~got & in_win & (labels >= 0)
            best = jnp.where(take, nl, best)
            got = got | take
        new_labels = jnp.where(got, best, labels)
        changed = jax.lax.psum(
            jnp.any(got != reached).astype(jnp.float32), axis_name) > 0
        return new_labels, got, changed, it + 1

    labels_loc, _, _, _ = jax.lax.while_loop(
        lambda s: s[2] & (s[3] < 2 * step),
        absorb_body, (labels_loc, reached, jnp.bool_(True), 0))
    return labels_loc


def _local_pair_counts(labels_loc, cfg: SlicConfig, lgh, t0, axis_name,
                       n_dev):
    """(gh, gw, 25) replicated superpixel adjacency from sharded pixel
    pairs (one boundary-row ppermute + one psum)."""
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    hb, wp = labels_loc.shape
    _, below = _row_exchange(labels_loc[-1], labels_loc[0], axis_name, n_dev,
                             jnp.int32(-1))
    ty = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0) // step + t0
    tx = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1) // step
    ga_y = labels_loc // gw
    ga_x = labels_loc % gw

    def pair_counts(b):
        dy = b // gw - ga_y
        dx = b % gw - ga_x
        oa_y = ga_y - ty + 1
        oa_x = ga_x - tx + 1
        ok = ((labels_loc != b) & (b >= 0) & (labels_loc >= 0)
              & (jnp.abs(dy) <= 2) & (jnp.abs(dx) <= 2)
              & (oa_y >= 0) & (oa_y < 3) & (oa_x >= 0) & (oa_x < 3))
        ch = (dy + 2) * 5 + (dx + 2)
        oa = oa_y * 3 + oa_x
        oh_a = jax.nn.one_hot(jnp.where(ok, oa, 0), 9, dtype=jnp.float32) \
            * ok[..., None].astype(jnp.float32)
        oh_c = jax.nn.one_hot(jnp.where(ok, ch, 0), 25, dtype=jnp.float32)
        a_t = oh_a.reshape(lgh, step, gw, step, 9).transpose(0, 2, 1, 3, 4) \
            .reshape(lgh * gw, step * step, 9)
        c_t = oh_c.reshape(lgh, step, gw, step, 25).transpose(0, 2, 1, 3, 4) \
            .reshape(lgh * gw, step * step, 25)
        return jnp.einsum('tpa,tpc->tac', a_t, c_t,
                          preferred_element_type=jnp.float32) \
            .reshape(lgh, gw, 9, 25)

    b_h = jnp.concatenate([labels_loc[:, 1:],
                           jnp.full((hb, 1), -2, jnp.int32)], 1)
    b_v = jnp.concatenate([labels_loc[1:], below[None]], 0)
    cnt9 = pair_counts(b_h) + pair_counts(b_v)
    part_halo = jnp.zeros((lgh + 2, gw, 25), jnp.float32)
    for idx, (di, dj) in enumerate(_OFFSETS):
        part_halo = part_halo + _route_halo(cnt9[:, :, idx], di, dj, gw)
    return _psum_halo(part_halo, cfg, t0, axis_name)   # raw directed counts


def _local_adjacency(labels_loc, cfg: SlicConfig, lgh, t0, axis_name, n_dev):
    from pyimsegm_tpu.ops.grid import _sym_mask_adjacency
    adj_raw = _local_pair_counts(labels_loc, cfg, lgh, t0, axis_name, n_dev)
    return _sym_mask_adjacency(adj_raw, cfg.grid_h, cfg.grid_w)


_MOMENT_FLAGS = ('mean', 'std', 'energy')


def _tiled_pipe_shard(lab_loc, valid_loc, feat_loc, centers0, spatial_w2,
                      pairwise, *, cfg, lgh, n_iter, axis_name, n_dev,
                      flags, nb_classes, estim_model, gc_edge_type, seed,
                      connectivity):
    from pyimsegm_tpu.models.class_model import estim_class_model
    from pyimsegm_tpu.ops.graphcut import compute_unary_cost
    from pyimsegm_tpu.ops.grid import grid_edge_weights, solve_mrf_grid

    step = cfg.step
    idx = jax.lax.axis_index(axis_name)
    t0 = idx * lgh

    def body(_, centers):
        _lbl, centers = _local_slic_iter(lab_loc, valid_loc, centers, cfg,
                                         lgh, spatial_w2, axis_name)
        return centers

    centers = jax.lax.fori_loop(0, max(n_iter - 1, 0), body, centers0)
    labels_loc, _ = _local_slic_iter(lab_loc, valid_loc, centers, cfg, lgh,
                                     spatial_w2, axis_name)
    # padded pixels must not join/propagate superpixels (parity with the
    # unsharded path, which crops before enforcement/adjacency)
    labels_loc = jnp.where(valid_loc > 0, labels_loc, -1)
    if connectivity:
        labels_loc = _local_enforce_connectivity(labels_loc, cfg, lgh, t0,
                                                 axis_name, n_dev)

    hb, wp = labels_loc.shape
    py = (jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 0)
          + (t0 * step).astype(jnp.float32))
    px = jax.lax.broadcasted_iota(jnp.float32, (hb, wp), 1)
    data = jnp.concatenate(
        [feat_loc, feat_loc * feat_loc,
         jnp.ones((hb, wp, 1), jnp.float32),
         py[..., None], px[..., None]], axis=-1) * valid_loc[..., None]
    sums = _local_segment_sum(data, labels_loc, cfg, lgh, t0, axis_name)
    counts = sums[:, 6]
    safe = jnp.maximum(counts[:, None], 1.0)
    sp_centers = sums[:, 7:9] / safe
    mean = sums[:, :3] / safe
    energy = sums[:, 3:6] / safe
    blocks = {'mean': mean,
              'std': jnp.sqrt(jnp.maximum(energy - mean * mean, 0.0)),
              'energy': energy}
    features = jnp.concatenate(
        [blocks[f] for f in _MOMENT_FLAGS if f in flags], axis=-1)

    mask = (counts > 0).astype(jnp.float32)
    model = estim_class_model(features, nb_classes, estim_model,
                              sample_weight=mask, seed=seed)
    proba = model.predict_proba(features)

    adj = _local_adjacency(labels_loc, cfg, lgh, t0, axis_name, n_dev)
    wgrid = grid_edge_weights(None, cfg, proba=proba, features=features,
                              edge_type=gc_edge_type, adj=adj,
                              centers=sp_centers)
    unary = compute_unary_cost(proba)
    class_lb = solve_mrf_grid(unary, wgrid, pairwise, cfg)

    segm_loc = jnp.round(_local_table_lookup(
        class_lb.astype(jnp.float32)[:, None], labels_loc, cfg, lgh,
        t0)[..., 0]).astype(jnp.int32)
    soft_loc = _local_table_lookup(proba, labels_loc, cfg, lgh, t0)
    return segm_loc, soft_loc


def pipe_color2d_slic_features_model_graphcut_tiled(
        image, nb_classes, dict_features, sp_size=30, sp_regul=0.2,
        estim_model='GMM', gc_regul=1.0, gc_edge_type='model', mesh=None,
        n_iter=10, seed=0, axis_name='rows', connectivity=True):
    """Unsupervised pipeline for ONE huge image sharded over a device mesh —
    the distributed counterpart of
    :func:`pyimsegm_tpu.pipelines.pipe_color2d_slic_features_model_graphcut`
    (reference scope: single-node `pipelines.py:46-110`; the reference has no
    tiling story, SURVEY §5).

    Supported features: a single color-space key with plain moment flags
    (mean/std/energy) — the same set the fused single-chip path accelerates.

    :param image: (H, W, 3) float array
    :param mesh: 1D `jax.sharding.Mesh`; defaults to all devices
    :returns: (segm (H, W) int32, segm_soft (H, W, C) float32) host arrays
    """
    from jax.sharding import Mesh, PartitionSpec as P
    from pyimsegm_tpu.ops import color as color_ops
    from pyimsegm_tpu.ops.graphcut import compute_pairwise_cost

    if len(dict_features) != 1:
        raise ValueError('tiled pipeline supports one color feature key')
    (fkey, flags), = dict_features.items()
    if not fkey.startswith('color') or any(f not in _MOMENT_FLAGS
                                           for f in flags):
        raise ValueError('tiled pipeline supports color moments only, got %r'
                         % (dict_features,))

    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, (axis_name,))
    n_dev = mesh.shape[axis_name]
    image = jnp.asarray(image)
    cfg = slic_config(image.shape[0], image.shape[1], sp_size)
    lgh = _shard_rows(cfg, n_dev)
    m = compactness_from_regul(sp_size, sp_regul)
    sw2 = (jnp.asarray(m, jnp.float32) / cfg.step) ** 2

    lab = _prepare_image(image)
    ph, pw = cfg.pad_h - cfg.height, cfg.pad_w - cfg.width
    lab_p = jnp.pad(lab, [(0, ph), (0, pw), (0, 0)], mode='edge')
    lab_p = lab_p.astype(jnp.bfloat16).astype(jnp.float32)
    valid = jnp.pad(jnp.ones((cfg.height, cfg.width), jnp.float32),
                    [(0, ph), (0, pw)])
    img_f = jnp.asarray(image, jnp.float32)
    feat_img = (color_ops.convert_img_color_from_rgb(
        img_f, fkey.split('_')[-1]) if '_' in fkey else img_f)
    feat_p = jnp.pad(feat_img, [(0, ph), (0, pw), (0, 0)])

    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    cy0 = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * step - 0.5
    cx0 = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * step - 0.5
    iy = jnp.clip(cy0.astype(jnp.int32), 0, cfg.height - 1)
    ix = jnp.clip(cx0.astype(jnp.int32), 0, cfg.width - 1)
    init_color = lab[iy][:, ix]
    cyg, cxg = jnp.meshgrid(cy0, cx0, indexing='ij')
    centers0 = jnp.concatenate([init_color, cyg[..., None], cxg[..., None]],
                               axis=-1)
    pairwise = jnp.asarray(compute_pairwise_cost(float(gc_regul), nb_classes),
                           jnp.float32)

    fn = jax.shard_map(
        functools.partial(_tiled_pipe_shard, cfg=cfg, lgh=lgh, n_iter=n_iter,
                          axis_name=axis_name, n_dev=n_dev,
                          flags=tuple(flags), nb_classes=nb_classes,
                          estim_model=estim_model, gc_edge_type=gc_edge_type,
                          seed=seed, connectivity=connectivity),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=(P(axis_name), P(axis_name)))
    segm, soft = jax.jit(fn)(lab_p, valid, feat_p, centers0, sw2, pairwise)
    return (np.asarray(segm)[:cfg.height, :cfg.width],
            np.asarray(soft)[:cfg.height, :cfg.width])
