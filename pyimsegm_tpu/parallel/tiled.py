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
    # same bf16 pixel quantisation as ops/slic.py (pixels only, not the
    # initial center colors), so sharded and single-device paths assign
    # from identical values
    lab_p = jnp.pad(lab, [(0, ph), (0, pw), (0, 0)], mode='edge')
    lab_p = lab_p.astype(jnp.bfloat16).astype(jnp.float32)
    valid = jnp.pad(jnp.ones((cfg.height, cfg.width), jnp.float32),
                    [(0, ph), (0, pw)])
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    cy0 = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * step - 0.5
    cx0 = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * step - 0.5
    iy = jnp.clip(cy0.astype(jnp.int32), 0, cfg.height - 1)
    ix = jnp.clip(cx0.astype(jnp.int32), 0, cfg.width - 1)
    init_color = lab[iy][:, ix]
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
