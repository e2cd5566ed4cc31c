"""3D anisotropic SLIC supervoxels.

Counterpart of ``segment_slic_img3d_gray``
(`/root/reference/imsegm/superpixels.py:72-112`): SLIC over a gray volume with
per-axis ``spacing`` (microscopy z-stacks are coarsely sampled in z).  Same
TPU design as the 2D kernel (`pyimsegm_tpu.ops.slic`): a static seed grid,
27-neighbor assignment by broadcast-upsampled center fields, one segment-sum
update per iteration.

The per-axis seed step follows the reference's size normalisation: a
superpixel of nominal edge ``sp_size`` in the *finest* axis spans
``sp_size * min(spacing) / spacing[i]`` voxels along axis i.
"""

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e10


class Slic3DConfig(NamedTuple):
    shape: tuple       # (Z, H, W)
    steps: tuple       # per-axis seed step (voxels)
    grid: tuple        # per-axis number of seeds
    pad: tuple         # padded dims (grid * step)
    spacing: tuple     # physical voxel spacing

    @property
    def n_segments(self) -> int:
        return self.grid[0] * self.grid[1] * self.grid[2]


def slic3d_config(shape, sp_size, spacing=(1, 1, 1)) -> Slic3DConfig:
    spacing = tuple(float(s) for s in spacing)
    mn = min(spacing)
    steps = tuple(max(1, int(round(sp_size * mn / s))) for s in spacing)
    grid = tuple(max(1, math.ceil(d / st)) for d, st in zip(shape, steps))
    pad = tuple(g * st for g, st in zip(grid, steps))
    return Slic3DConfig(tuple(shape), steps, grid, pad, spacing)


def _upsample3d(grid_arr, steps):
    gz, gy, gx, f = grid_arr.shape
    sz, sy, sx = steps
    out = jnp.broadcast_to(
        grid_arr[:, None, :, None, :, None, :],
        (gz, sz, gy, sy, gx, sx, f))
    return out.reshape(gz * sz, gy * sy, gx * sx, f)


def _prep3d(volume, cfg: Slic3DConfig):
    """Normalise, pad, and seed: shared by the XLA and Pallas backends.

    :returns: (vol_p padded volume, valid mask, centers0 (gz,gy,gx,4),
        sw spatial normaliser)
    """
    z, h, w = cfg.shape
    gz, gy, gx = cfg.grid
    sz, sy, sx = cfg.steps
    vol = volume.astype(jnp.float32)
    lo, hi = jnp.min(vol), jnp.max(vol)
    vol = (vol - lo) / jnp.maximum(hi - lo, 1e-12)

    pz, py, px = (cfg.pad[0] - z, cfg.pad[1] - h, cfg.pad[2] - w)
    vol_p = jnp.pad(vol, [(0, pz), (0, py), (0, px)], mode='edge')
    valid = jnp.pad(jnp.ones((z, h, w), jnp.float32),
                    [(0, pz), (0, py), (0, px)])

    z0 = (jnp.arange(gz, dtype=jnp.float32) + 0.5) * sz - 0.5
    y0 = (jnp.arange(gy, dtype=jnp.float32) + 0.5) * sy - 0.5
    x0 = (jnp.arange(gx, dtype=jnp.float32) + 0.5) * sx - 0.5
    iz = jnp.clip(z0.astype(jnp.int32), 0, z - 1)
    iy = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    init_val = vol[iz][:, iy][:, :, ix]
    zz, yy, xx = jnp.meshgrid(z0, y0, x0, indexing='ij')
    centers0 = jnp.stack([init_val, zz, yy, xx], axis=-1)   # (gz,gy,gx,4)

    # spatial normalisation: physical distance relative to nominal size
    nominal = float(max(sz * cfg.spacing[0], sy * cfg.spacing[1],
                        sx * cfg.spacing[2]))
    sw = 1.0 / nominal ** 2
    return vol_p, valid, centers0, sw


#: scoped-VMEM budget for the 3D pass kernel's (sz*sy, wp) slab + candidate
#: broadcast temporaries (validated at the 48x640x768 bench scale:
#: pallas-vs-XLA agreement 0.996, 2.7x throughput — BENCH/QUALITY round 5)
_VMEM_3D = 64 * 1024 * 1024
_PLANES_3D = 24


def _pallas3d_fits(cfg) -> bool:
    """Size guard: a (sz*sy, pad_w) f32 slab with ~``_PLANES_3D`` live
    temporaries plus the (gz+2, gy+2, 6, gx) candidate table must fit the
    scoped-VMEM budget (mirrors the 2D kernels' band_fits guard)."""
    sz, sy, _sx = cfg.steps
    gz, gy, gx = cfg.grid
    slab = sz * sy * cfg.pad[2] * 4
    table = (gz + 2) * (gy + 2) * 8 * gx * 4
    return _PLANES_3D * slab + table < _VMEM_3D


def _use_pallas_3d(cfg=None) -> bool:
    import os
    from pyimsegm_tpu.ops.slic import _pallas_available
    # default ON (validated at bench scale, see QUALITY.md round 5);
    # PYIMSEGM_SLIC3D_PALLAS=0 forces the XLA path, =1 forces the kernel
    flag = os.environ.get('PYIMSEGM_SLIC3D_PALLAS', 'auto')
    if flag == '0':
        return False
    if not _pallas_available():
        return False
    if flag == '1':
        return True
    return cfg is None or _pallas3d_fits(cfg)


def slic3d_segment(volume, cfg: Slic3DConfig, compactness, n_iter=10):
    """Supervoxel labels (Z, H, W) int32 in [0, K).

    Backend dispatch (XLA vs Pallas kernel) happens HERE, at call time and
    outside any jit trace, so each backend owns its own jit cache and
    flipping ``PYIMSEGM_SLIC3D_PALLAS`` between calls takes effect.
    """
    if _use_pallas_3d(cfg):
        return _slic3d_segment_pallas(volume, cfg, compactness, n_iter)
    return _slic3d_segment_xla(volume, cfg, compactness, n_iter)


@functools.partial(jax.jit, static_argnames=('cfg', 'n_iter'))
def _slic3d_segment_pallas(volume, cfg: Slic3DConfig, compactness,
                           n_iter=10):
    from pyimsegm_tpu.ops.slic3d_pallas import slic3d_iterate_pallas
    vol_p, _valid, centers0, sw = _prep3d(volume, cfg)
    m2 = jnp.asarray(compactness, jnp.float32) ** 2
    scales = jnp.asarray(cfg.spacing, jnp.float32) * jnp.sqrt(sw * m2)
    return slic3d_iterate_pallas(vol_p, centers0, scales, cfg, n_iter)


@functools.partial(jax.jit, static_argnames=('cfg', 'n_iter'))
def _slic3d_segment_xla(volume, cfg: Slic3DConfig, compactness, n_iter=10):
    z, h, w = cfg.shape
    gz, gy, gx = cfg.grid
    sz, sy, sx = cfg.steps
    vol_p, valid, centers0, sw = _prep3d(volume, cfg)
    m2 = jnp.asarray(compactness, jnp.float32) ** 2
    dp, hp, wp = cfg.pad

    space = jnp.asarray(cfg.spacing, jnp.float32)
    cz = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 0)
    cy = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 1)
    cx = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 2)

    offsets = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]

    def assign(centers, want_labels):
        """27-candidate argmin; returns labels or the winning offset index.

        The winning offset (int8) is enough for the scatter-free update —
        per-offset masked tile sums + shifts — which replaces the original
        ``jax.ops.segment_sum`` over 10^7 voxels (an unsorted scatter-add,
        catastrophic on TPU: the whole pipeline ran at ~2 MVox/s)."""
        best_d = jnp.full((dp, hp, wp), _BIG, jnp.float32)
        best_o = jnp.zeros((dp, hp, wp), jnp.int8)
        best_lb = jnp.zeros((dp, hp, wp), jnp.int32) if want_labels else None
        tz = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 0)
        ty = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 1)
        tx = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 2)
        for oi, (dz_, dy_, dx_) in enumerate(offsets):
            nz, ny, nx = tz + dz_, ty + dy_, tx + dx_
            inb = ((nz >= 0) & (nz < gz) & (ny >= 0) & (ny < gy)
                   & (nx >= 0) & (nx < gx))
            nb = jnp.roll(centers, (-dz_, -dy_, -dx_), axis=(0, 1, 2))
            nb = jnp.where(inb[..., None], nb, _BIG)
            cf = _upsample3d(nb, cfg.steps)
            dc2 = (vol_p - cf[..., 0]) ** 2
            ds2 = ((cz - cf[..., 1]) * space[0]) ** 2 \
                + ((cy - cf[..., 2]) * space[1]) ** 2 \
                + ((cx - cf[..., 3]) * space[2]) ** 2
            d = dc2 + ds2 * sw * m2
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_o = jnp.where(take, jnp.int8(oi), best_o)
            if want_labels:
                nb_id = jnp.where(inb, (nz * gy * gx + ny * gx + nx), 0) \
                    .astype(jnp.int32)
                lbf = _upsample3d(nb_id[..., None].astype(jnp.float32),
                                  cfg.steps)[..., 0].astype(jnp.int32)
                best_lb = jnp.where(take, lbf, best_lb)
        return best_lb, best_o

    def _shift3(grid, dz_, dy_, dx_):
        pad = [(max(dz_, 0), max(-dz_, 0)), (max(dy_, 0), max(-dy_, 0)),
               (max(dx_, 0), max(-dx_, 0)), (0, 0)]
        padded = jnp.pad(grid, pad)
        return padded[max(-dz_, 0):max(-dz_, 0) + gz,
                      max(-dy_, 0):max(-dy_, 0) + gy,
                      max(-dx_, 0):max(-dx_, 0) + gx]

    def body(_, centers):
        _lb, best_o = assign(centers, want_labels=False)
        data = jnp.stack(
            [vol_p, cz, cy, cx, jnp.ones((dp, hp, wp), jnp.float32)],
            axis=-1) * valid[..., None]
        sums = jnp.zeros((gz, gy, gx, 5), jnp.float32)
        for oi, (dz_, dy_, dx_) in enumerate(offsets):
            mask = (best_o == oi).astype(jnp.float32)[..., None]
            part = (data * mask).reshape(gz, sz, gy, sy, gx, sx, 5) \
                .sum(axis=(1, 3, 5))
            sums = sums + _shift3(part, dz_, dy_, dx_)
        cnt = sums[..., 4:5]
        new = sums[..., :4] / jnp.maximum(cnt, 1.0)
        return jnp.where(cnt > 0, new, centers)

    # n_iter-1 update rounds + final assignment (skimage iteration order,
    # matching ops/slic.py)
    centers = jax.lax.fori_loop(0, max(n_iter - 1, 0), body, centers0)
    labels, _ = assign(centers, want_labels=True)
    return labels[:z, :h, :w]


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid3d_segment_sum(data, labels, cfg: Slic3DConfig):
    """Per-supervoxel sums of (Z, H, W, F) data, scatter-free.

    Exploits the 3x3x3-tile invariant of :func:`slic3d_segment` labels: the
    voxel->supervoxel routing is one of 27 relative offsets recomputable
    from the label value, so the reduction is 27 masked tile sums + shifts
    instead of an unsorted ``segment_sum`` scatter (which ran ~100x slower
    on TPU).

    :param data: (Z, H, W, F) float
    :param labels: (Z, H, W) int32 supervoxel ids
    :returns: (K, F) float32 sums
    """
    gz, gy, gx = cfg.grid
    sz, sy, sx = cfg.steps
    f = data.shape[-1]
    pz = cfg.pad[0] - data.shape[0]
    py = cfg.pad[1] - data.shape[1]
    px = cfg.pad[2] - data.shape[2]
    data_p = jnp.pad(data.astype(jnp.float32),
                     [(0, pz), (0, py), (0, px), (0, 0)])
    labels_p = jnp.pad(labels, [(0, pz), (0, py), (0, px)],
                       constant_values=-2)
    dp, hp, wp = cfg.pad

    lz = labels_p // (gy * gx)
    rem = labels_p - lz * (gy * gx)
    ly = rem // gx
    lx = rem - ly * gx
    tz = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 0) // sz
    ty = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 1) // sy
    tx = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 2) // sx
    dz = lz - tz + 1
    dy = ly - ty + 1
    dx = lx - tx + 1
    ok = ((labels_p >= 0) & (dz >= 0) & (dz < 3) & (dy >= 0) & (dy < 3)
          & (dx >= 0) & (dx < 3))
    off = jnp.where(ok, dz * 9 + dy * 3 + dx, -1)

    def _shift3(grid, dz_, dy_, dx_):
        pad = [(max(dz_, 0), max(-dz_, 0)), (max(dy_, 0), max(-dy_, 0)),
               (max(dx_, 0), max(-dx_, 0)), (0, 0)]
        padded = jnp.pad(grid, pad)
        return padded[max(-dz_, 0):max(-dz_, 0) + gz,
                      max(-dy_, 0):max(-dy_, 0) + gy,
                      max(-dx_, 0):max(-dx_, 0) + gx]

    sums = jnp.zeros((gz, gy, gx, f), jnp.float32)
    for oi, (a, b, c) in enumerate(
            [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
             for c in (-1, 0, 1)]):
        mask = (off == oi).astype(jnp.float32)[..., None]
        part = (data_p * mask).reshape(gz, sz, gy, sy, gx, sx, f) \
            .sum(axis=(1, 3, 5))
        sums = sums + _shift3(part, a, b, c)
    return sums.reshape(gz * gy * gx, f)


@functools.partial(jax.jit, static_argnames=('cfg',))
def grid3d_lookup(table, labels, cfg: Slic3DConfig):
    """Per-voxel ``table[labels]`` without a gather: 27 shifted grid
    broadcasts selected by the voxel's offset code (the 3D analog of
    ``ops.grid.grid_lookup``; a plain 23.6M-row gather measured ~200 ms at
    bench scale, this runs as fused elementwise selects).

    :param table: (K,) or (K, C)
    :param labels: (Z, H, W) int32 grid-structured supervoxel labels
    :returns: (Z, H, W) or (Z, H, W, C), dtype of ``table``
    """
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
    c = table.shape[-1]
    gz, gy, gx = cfg.grid
    sz, sy, sx = cfg.steps
    z, h, w = cfg.shape
    pz, py, px = (cfg.pad[0] - z, cfg.pad[1] - h, cfg.pad[2] - w)
    labels_p = jnp.pad(labels, [(0, pz), (0, py), (0, px)],
                       constant_values=-2)
    dp, hp, wp = cfg.pad

    lz = labels_p // (gy * gx)
    rem = labels_p - lz * (gy * gx)
    ly = rem // gx
    lx = rem - ly * gx
    tz = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 0) // sz
    ty = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 1) // sy
    tx = jax.lax.broadcasted_iota(jnp.int32, (dp, hp, wp), 2) // sx
    dz, dy, dx = lz - tz + 1, ly - ty + 1, lx - tx + 1
    ok = ((labels_p >= 0) & (dz >= 0) & (dz < 3) & (dy >= 0) & (dy < 3)
          & (dx >= 0) & (dx < 3))
    off = jnp.where(ok, dz * 9 + dy * 3 + dx, -1)

    tgrid = table.astype(jnp.float32).reshape(gz, gy, gx, c)
    out = jnp.zeros((dp, hp, wp, c), jnp.float32)
    for oi, (a, b, d) in enumerate(
            [(a, b, d) for a in (-1, 0, 1) for b in (-1, 0, 1)
             for d in (-1, 0, 1)]):
        pad = [(max(-a, 0), max(a, 0)), (max(-b, 0), max(b, 0)),
               (max(-d, 0), max(d, 0)), (0, 0)]
        src = jnp.pad(tgrid, pad)[max(a, 0):max(a, 0) + gz,
                                  max(b, 0):max(b, 0) + gy,
                                  max(d, 0):max(d, 0) + gx]
        up = jnp.broadcast_to(
            src[:, None, :, None, :, None, :],
            (gz, sz, gy, sy, gx, sx, c)).reshape(dp, hp, wp, c)
        out = jnp.where((off == oi)[..., None], up, out)
    out = out[:z, :h, :w].astype(table.dtype)
    return out[..., 0] if squeeze else out


def _neighbor_msg3d(qp, wgrid):
    """Accumulate 125-neighbourhood messages at grid scale.

    :param qp: (gz, gy, gx, C) per-cell class field
    :param wgrid: (gz, gy, gx, 125) edge weights (0 where no edge)
    :returns: (gz, gy, gx, C) sum over neighbours of w * qp[neighbour]
    """
    gz, gy, gx, c = qp.shape
    out = jnp.zeros_like(qp)
    ci = 0
    for dz in (-2, -1, 0, 1, 2):
        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                pad = [(max(-dz, 0), max(dz, 0)), (max(-dy, 0), max(dy, 0)),
                       (max(-dx, 0), max(dx, 0)), (0, 0)]
                nb = jnp.pad(qp, pad)[max(dz, 0):max(dz, 0) + gz,
                                      max(dy, 0):max(dy, 0) + gy,
                                      max(dx, 0):max(dx, 0) + gx]
                out = out + wgrid[..., ci:ci + 1] * nb
                ci += 1
    return out


def wgrid3d_from_edges(edges, valid, weights, cfg: Slic3DConfig):
    """(gz, gy, gx, 125) symmetric edge-weight tensor from an edge list.

    One small scatter (E valid edges, both directions); supervoxel cells
    always lie within +-2 of each other (the 3x3x3 assignment window), so
    the 5^3 channel space is exact.
    """
    gz, gy, gx = cfg.grid
    k = cfg.n_segments
    a, b = edges[:, 0], edges[:, 1]

    def cell(i):
        z = i // (gy * gx)
        r = i - z * (gy * gx)
        return z, r // gx, r - (r // gx) * gx

    az, ay, ax = cell(a)
    bz, by, bx = cell(b)

    def chan(d0, d1, d2):
        return ((d0 + 2) * 5 + (d1 + 2)) * 5 + (d2 + 2)

    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    wg = jnp.zeros((k, 125), jnp.float32)
    wg = wg.at[a, chan(bz - az, by - ay, bx - ax)].add(w)
    wg = wg.at[b, chan(az - bz, ay - by, ax - bx)].add(w)
    return wg.reshape(gz, gy, gx, 125)


def grid3d_mrf_energy(labels_g, ug, wgrid, pairwise):
    """MRF energy of a per-cell labelling on the 125-neighbour structure
    (each undirected edge counted twice -> halve the pairwise term)."""
    c = ug.shape[-1]
    onehot = jax.nn.one_hot(labels_g, c, dtype=jnp.float32)
    unary = jnp.sum(jnp.take_along_axis(ug, labels_g[..., None], -1))
    pw = jnp.sum(onehot * _neighbor_msg3d(onehot @ pairwise.T, wgrid))
    return unary + 0.5 * pw


@functools.partial(jax.jit, static_argnames=('cfg', 'n_mf_iters',
                                             'n_icm_iters'))
def solve_mrf_grid3d(unary, wgrid, pairwise, cfg: Slic3DConfig,
                     n_mf_iters=30, n_icm_iters=12, damping=0.5):
    """Dense mean-field + ICM on the 125-neighbour supervoxel grid graph —
    the 3D analog of ``ops.grid.solve_mrf_grid``; replaces the edge-list
    ``solve_mrf`` whose per-iteration segment-sum scatters cost ~6 s at
    bench scale (tools/profile_cfg6.py).

    :param unary: (K, C)
    :param wgrid: (gz, gy, gx, 125)
    :returns: (K,) int32 labels
    """
    gz, gy, gx = cfg.grid
    c = unary.shape[-1]
    ug = unary.reshape(gz, gy, gx, c).astype(jnp.float32)
    pairwise = jnp.asarray(pairwise, jnp.float32)

    def message(q):
        with jax.default_matmul_precision('highest'):
            return _neighbor_msg3d(q @ pairwise.T, wgrid)

    q0 = jax.nn.softmax(-ug, axis=-1)

    def mf_step(_, q):
        q_new = jax.nn.softmax(-(ug + message(q)), axis=-1)
        return damping * q_new + (1.0 - damping) * q

    q = jax.lax.fori_loop(0, n_mf_iters, mf_step, q0)
    labels = jnp.argmin(ug + message(q), axis=-1).astype(jnp.int32)

    def icm_step(_, carry):
        labels, best_labels, best_e = carry
        onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
        new_labels = jnp.argmin(ug + message(onehot),
                                axis=-1).astype(jnp.int32)
        e = grid3d_mrf_energy(new_labels, ug, wgrid, pairwise)
        improved = e < best_e
        best_labels = jnp.where(improved, new_labels, best_labels)
        best_e = jnp.where(improved, e, best_e)
        return new_labels, best_labels, best_e

    e0 = grid3d_mrf_energy(labels, ug, wgrid, pairwise)
    _, best_labels, _ = jax.lax.fori_loop(
        0, n_icm_iters, icm_step, (labels, labels, e0))
    return best_labels.reshape(-1)


def segment_slic_img3d_gray(volume, sp_size=50, relative_compact=0.1,
                            space=(1, 1, 1), n_iter=10):
    """Host convenience mirroring `superpixels.py:72`."""
    import numpy as np
    from pyimsegm_tpu.ops.slic import compactness_from_regul
    volume = np.asarray(volume)
    cfg = slic3d_config(volume.shape, sp_size, space)
    m = compactness_from_regul(sp_size, relative_compact)
    return np.asarray(slic3d_segment(jnp.asarray(volume), cfg, m, n_iter=n_iter))
