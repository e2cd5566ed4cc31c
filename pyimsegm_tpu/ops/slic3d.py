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


def _use_pallas_3d() -> bool:
    import os
    from pyimsegm_tpu.ops.slic import _pallas_available
    # opt-in until the kernel is validated on a live chip
    # (PYIMSEGM_SLIC3D_PALLAS=1)
    return (_pallas_available()
            and os.environ.get('PYIMSEGM_SLIC3D_PALLAS', '0') == '1')


def slic3d_segment(volume, cfg: Slic3DConfig, compactness, n_iter=10):
    """Supervoxel labels (Z, H, W) int32 in [0, K).

    Backend dispatch (XLA vs Pallas kernel) happens HERE, at call time and
    outside any jit trace, so each backend owns its own jit cache and
    flipping ``PYIMSEGM_SLIC3D_PALLAS`` between calls takes effect.
    """
    if _use_pallas_3d():
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


def segment_slic_img3d_gray(volume, sp_size=50, relative_compact=0.1,
                            space=(1, 1, 1), n_iter=10):
    """Host convenience mirroring `superpixels.py:72`."""
    import numpy as np
    from pyimsegm_tpu.ops.slic import compactness_from_regul
    volume = np.asarray(volume)
    cfg = slic3d_config(volume.shape, sp_size, space)
    m = compactness_from_regul(sp_size, relative_compact)
    return np.asarray(slic3d_segment(jnp.asarray(volume), cfg, m, n_iter=n_iter))
