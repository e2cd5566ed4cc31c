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


@functools.partial(jax.jit, static_argnames=('cfg', 'n_iter'))
def slic3d_segment(volume, cfg: Slic3DConfig, compactness, n_iter=10):
    """Supervoxel labels (Z, H, W) int32 in [0, K)."""
    z, h, w = cfg.shape
    gz, gy, gx = cfg.grid
    sz, sy, sx = cfg.steps
    k_sp = cfg.n_segments
    vol = volume.astype(jnp.float32)
    lo, hi = jnp.min(vol), jnp.max(vol)
    vol = (vol - lo) / jnp.maximum(hi - lo, 1e-12)

    pz, py, px = (cfg.pad[0] - z, cfg.pad[1] - h, cfg.pad[2] - w)
    vol_p = jnp.pad(vol, [(0, pz), (0, py), (0, px)], mode='edge')
    valid = jnp.pad(jnp.ones((z, h, w), jnp.float32),
                    [(0, pz), (0, py), (0, px)])
    dp, hp, wp = cfg.pad

    space = jnp.asarray(cfg.spacing, jnp.float32)
    cz = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 0)
    cy = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 1)
    cx = jax.lax.broadcasted_iota(jnp.float32, (dp, hp, wp), 2)

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
    nominal = float(max(sz * cfg.spacing[0], sy * cfg.spacing[1], sx * cfg.spacing[2]))
    sw = 1.0 / nominal ** 2
    m2 = jnp.asarray(compactness, jnp.float32) ** 2

    offsets = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]

    def assign(centers):
        best_d = jnp.full((dp, hp, wp), _BIG, jnp.float32)
        best_lb = jnp.zeros((dp, hp, wp), jnp.int32)
        tz = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 0)
        ty = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 1)
        tx = jax.lax.broadcasted_iota(jnp.int32, (gz, gy, gx), 2)
        for dz_, dy_, dx_ in offsets:
            nz, ny, nx = tz + dz_, ty + dy_, tx + dx_
            inb = ((nz >= 0) & (nz < gz) & (ny >= 0) & (ny < gy)
                   & (nx >= 0) & (nx < gx))
            nb = jnp.roll(centers, (-dz_, -dy_, -dx_), axis=(0, 1, 2))
            nb_id = (nz * gy * gx + ny * gx + nx).astype(jnp.int32)
            nb = jnp.where(inb[..., None], nb, _BIG)
            nb_id = jnp.where(inb, nb_id, 0)
            cf = _upsample3d(nb, cfg.steps)
            lbf = _upsample3d(nb_id[..., None].astype(jnp.float32),
                              cfg.steps)[..., 0].astype(jnp.int32)
            dc2 = (vol_p - cf[..., 0]) ** 2
            ds2 = ((cz - cf[..., 1]) * space[0]) ** 2 \
                + ((cy - cf[..., 2]) * space[1]) ** 2 \
                + ((cx - cf[..., 3]) * space[2]) ** 2
            d = dc2 + ds2 * sw * m2
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_lb = jnp.where(take, lbf, best_lb)
        return best_lb

    def body(_, centers):
        labels = assign(centers)
        flat = labels.reshape(-1)
        wgt = valid.reshape(-1, 1)
        data = jnp.concatenate(
            [vol_p.reshape(-1, 1), cz.reshape(-1, 1), cy.reshape(-1, 1),
             cx.reshape(-1, 1), jnp.ones_like(wgt)], axis=-1) * wgt
        sums = jax.ops.segment_sum(data, flat, num_segments=k_sp)
        cnt = sums[:, 4:5]
        new = (sums[:, :4] / jnp.maximum(cnt, 1.0)).reshape(gz, gy, gx, 4)
        return jnp.where((cnt.reshape(gz, gy, gx) > 0)[..., None], new, centers)

    centers = jax.lax.fori_loop(0, n_iter, body, centers0)
    labels = assign(centers)
    return labels[:z, :h, :w]


def segment_slic_img3d_gray(volume, sp_size=50, relative_compact=0.1,
                            space=(1, 1, 1), n_iter=10):
    """Host convenience mirroring `superpixels.py:72`."""
    import numpy as np
    from pyimsegm_tpu.ops.slic import compactness_from_regul
    volume = np.asarray(volume)
    cfg = slic3d_config(volume.shape, sp_size, space)
    m = compactness_from_regul(sp_size, relative_compact)
    return np.asarray(slic3d_segment(jnp.asarray(volume), cfg, m, n_iter=n_iter))
