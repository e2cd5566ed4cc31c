"""Ray features: distances from a point to the object boundary per angle.

TPU-native form of the reference's sequential ray march
(`/root/reference/imsegm/descriptors.py:1630-1895`): instead of early-exit
marching per ray, all (position, angle, step) samples are evaluated at once —
a static ladder of nearest-neighbor samples along each ray, with the first
boundary hit found by an argmax over the step axis.  The march replicates the
reference's stepping exactly: direction ``(sin a, cos a) / max(|.|)`` (one
pixel along the dominant axis per step), nearest-pixel lookup, euclidean
distance to the hit, -1 when no hit before leaving the image.

Also provides the FFT-phase rotation alignment ``shift_ray_features``
(`descriptors.py:1761-1802`) and ray reconstruction/interpolation utilities.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ray_directions(angle_step):
    angles = np.arange(0, 360, angle_step)
    rad = np.deg2rad(angles)
    grad = np.stack([np.sin(rad), np.cos(rad)], axis=1)
    grad = grad / np.abs(grad).max(axis=1, keepdims=True)
    return angles, jnp.asarray(grad, jnp.float32)


#: ray-march chunk length: most rays resolve (hit or leave the image)
#: within a few hundred pixels, so the march runs chunk-by-chunk and stops
#: as soon as every ray is resolved instead of sampling the full diagonal
_RAY_CHUNK = 128


@functools.partial(jax.jit, static_argnames=('angle_step', 'edge'))
def ray_features_positions_core(seg_binary, positions, angle_step=5.0,
                                edge='up'):
    """Ray distances for many positions at once.

    The march evaluates ``_RAY_CHUNK`` ladder steps per ``while_loop``
    iteration for every (position, angle) ray and exits once every ray has
    either hit the mask or left the image — the same first-hit semantics as
    the reference's per-ray early-exit loop (`descriptors.py:1692-1712`),
    vectorised without paying the full image diagonal when (as in the
    center-detection chain) hits land within a few superpixels.

    :param seg_binary: (H, W) bool/float boundary mask
    :param positions: (P, 2) float (row, col)
    :param angle_step: static angular resolution in degrees
    :param edge: 'up' (first entry into the mask) or 'down' (first exit after
        an entry)
    :returns: (P, A) float distances; -1 where the ray leaves the image first
    """
    seg = jnp.asarray(seg_binary).astype(bool)
    h, w = seg.shape
    n_steps = int(np.ceil(np.sqrt(h * h + w * w)))
    _angles, grad = _ray_directions(angle_step)      # (A, 2)
    a = grad.shape[0]
    pos = jnp.asarray(positions, jnp.float32)        # (P, 2)
    p = pos.shape[0]

    origin = seg[jnp.clip(pos[:, 0].astype(jnp.int32), 0, h - 1),
                 jnp.clip(pos[:, 1].astype(jnp.int32), 0, w - 1)]  # (P,)

    tc = jnp.arange(1, _RAY_CHUNK + 1, dtype=jnp.float32)      # (C,)
    org = jnp.broadcast_to(origin[:, None], (p, a))

    def chunk(state):
        t0, first, alive, prev = state
        t = t0.astype(jnp.float32) + tc                        # (C,)
        # sample coordinates: (P, A, C, 2) — one chunk of the ladder
        coords = (pos[:, None, None, :]
                  + grad[None, :, None, :] * t[None, None, :, None])
        ry = jnp.round(coords[..., 0])
        rx = jnp.round(coords[..., 1])
        inb = ((coords[..., 0] >= 0) & (ry < h)
               & (coords[..., 1] >= 0) & (rx < w))
        iy = jnp.clip(ry.astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(rx.astype(jnp.int32), 0, w - 1)
        samples = seg[iy, ix]                                  # (P, A, C)
        # in-bounds is monotone along the ray; fold in the carried state
        alive_c = (jnp.cumprod(inb.astype(jnp.int32), axis=-1).astype(bool)
                   & alive[..., None])
        if edge == 'up':
            hit = samples & alive_c
        else:
            prev_c = jnp.concatenate([prev[..., None], samples[..., :-1]],
                                     axis=-1)
            hit = prev_c & (~samples) & alive_c
        has = jnp.any(hit, axis=-1)
        loc = t0 + 1 + jnp.argmax(hit, axis=-1).astype(jnp.int32)
        first = jnp.where((first < 0) & has, loc, first)
        return (t0 + _RAY_CHUNK, first, alive_c[..., -1],
                jnp.where(alive_c[..., -1], samples[..., -1], prev))

    def unresolved(state):
        t0, first, alive, _prev = state
        return (t0 < n_steps) & jnp.any((first < 0) & alive)

    state = (jnp.int32(0), jnp.full((p, a), -1, jnp.int32),
             jnp.ones((p, a), bool), org)
    _t0, first, _alive, _prev = jax.lax.while_loop(unresolved, chunk, state)

    # a hit found beyond the diagonal cap is out of the reference's march
    any_hit = (first > 0) & (first <= n_steps)
    step_len = jnp.sqrt(jnp.sum(grad * grad, axis=-1))          # (A,)
    dist = first.astype(jnp.float32) * step_len[None, :]
    dist = jnp.where(any_hit, dist, -1.0)
    if edge == 'up':
        # reference: position already inside the mask -> all zeros
        dist = jnp.where(org, 0.0, dist)
    return dist


def compute_ray_features_segm_2d(seg_binary, position, angle_step=5.0,
                                 smooth_coef=0, edge='up'):
    """Single-position API matching `descriptors.py:1715-1758`."""
    dist = ray_features_positions_core(
        jnp.asarray(seg_binary), jnp.asarray([position], jnp.float32),
        angle_step=float(angle_step), edge=edge)[0]
    dist = np.asarray(dist)
    if smooth_coef is not None and smooth_coef > 0:
        from scipy.ndimage import gaussian_filter1d
        dist = gaussian_filter1d(dist, smooth_coef)
    return dist


def shift_ray_features(ray_dist, method='phase'):
    """Rotation alignment by FFT phase (or plain max)
    (`descriptors.py:1761-1802`); returns (shifted rays, shift degrees)."""
    ray_dist = np.asarray(ray_dist)
    angle_step = 360.0 / len(ray_dist)
    if method == 'phase':
        ext = np.hstack([ray_dist] * 5)
        spectrum = np.fft.fft(ext - np.mean(ext)) / float(len(ext))
        magnitude = np.abs(spectrum)[:len(ext) // 2]
        idx = int(np.argmax(magnitude))
        shift = np.rad2deg(-np.angle(spectrum)[idx])
        shift = (360 + shift) if shift < 0 else shift
    else:
        shift = float(np.argmax(ray_dist) * angle_step)
    k = int(round(shift / angle_step))
    return np.concatenate([ray_dist[k:], ray_dist[:k]]), shift


def shift_ray_features_batched(rays):
    """Traceable batched FFT phase alignment (the jnp twin of
    :func:`shift_ray_features` for all rays at once — used by the fused
    centre-detection core so the per-ray host FFT loop disappears).

    :param rays: (P, A) distances
    :returns: (aligned (P, A), shifts (P,) degrees)
    """
    rays = jnp.asarray(rays, jnp.float32)
    p, a = rays.shape
    ext = jnp.tile(rays, (1, 5))
    spec = jnp.fft.fft(ext - jnp.mean(ext, axis=1, keepdims=True),
                       axis=1) / (5.0 * a)
    mag = jnp.abs(spec)[:, :5 * a // 2]
    idx = jnp.argmax(mag, axis=1)
    ang = -jnp.angle(spec[jnp.arange(p), idx])
    shift = jnp.rad2deg(ang)
    shift = jnp.where(shift < 0, shift + 360.0, shift)
    k = jnp.round(shift / (360.0 / a)).astype(jnp.int32) % a
    col = (jnp.arange(a, dtype=jnp.int32)[None, :] + k[:, None]) % a
    return jnp.take_along_axis(rays, col, axis=1), shift


def compute_ray_features_positions(segm, list_positions, angle_step=5.0,
                                   border_labels=None, segm_open=None,
                                   smooth_ray=None, shifting=True, edge='up'):
    """Ray features for many positions (`descriptors.py:1805-1895`).

    :returns: (rays (P, A), shifts list, names)
    """
    from pyimsegm_tpu.ops.morphology import binary_opening
    segm = np.asarray(segm)
    border_labels = border_labels if border_labels is not None else [0]
    if segm.ndim == 3:
        segm = np.argmax(segm, axis=-1)
    seg_binary = np.isin(segm, border_labels)
    if isinstance(segm_open, int):
        seg_binary = np.asarray(binary_opening(jnp.asarray(seg_binary), segm_open))

    rays = np.asarray(ray_features_positions_core(
        jnp.asarray(seg_binary), jnp.asarray(list_positions, jnp.float32),
        angle_step=float(angle_step), edge=edge))
    if smooth_ray is not None and smooth_ray > 0:
        from scipy.ndimage import gaussian_filter1d
        rays = gaussian_filter1d(rays, smooth_ray, axis=1)
    shifts = []
    if shifting:
        out = []
        for r in rays:
            r2, s = shift_ray_features(r)
            out.append(r2)
            shifts.append(float(s))
        rays = np.asarray(out)
    else:
        shifts = [0.0] * len(rays)
    names = ['ray-lb_%s-agl_%i' % (''.join(map(str, border_labels)), int(a))
             for a in np.linspace(0, 360 - angle_step, rays.shape[1])]
    return rays, shifts, names


def interpolate_ray_dist(ray_dists, order='spline'):
    """Fill -1 gaps by polynomial / periodic-spline / cosine LSQ fits
    (`descriptors.py:1898-1962`)."""
    from scipy import interpolate, optimize
    x_space = np.arange(len(ray_dists))
    ray_dists = np.array(ray_dists)
    missing = ray_dists == -1
    x_train = x_space[~missing]
    y_train = ray_dists[~missing]
    if not y_train.size:
        return ray_dists
    x_ext = np.hstack((x_train - len(x_space), x_train, x_train + len(x_space)))
    y_ext = np.array(y_train.tolist() * 3)
    if isinstance(order, int):
        z = np.polyfit(x_train, y_train, order)
        ray_dists[missing] = np.poly1d(z)(x_space[missing])
    elif order == 'spline':
        spline = interpolate.InterpolatedUnivariateSpline(x_ext, y_ext)
        ray_dists[missing] = spline(x_space[missing])
    elif order == 'cos':
        def _fn(xp, t):
            return xp[0] + xp[1] * np.sin(xp[2] + xp[3] * t)

        x0 = np.array([np.mean(y_train), (y_train.max() - y_train.min()) / 2.0,
                       0, len(x_space) / np.pi])
        res = optimize.least_squares(lambda xp, t, y: _fn(xp, t) - y, x0,
                                     gtol=1e-1, args=(x_train, y_train))
        ray_dists[missing] = _fn(res.x, x_space[missing])
    return ray_dists


def reconstruct_ray_features_2d(position, ray_features, shift=0):
    """Back-project ray distances to boundary points
    (`descriptors.py:1965-2002`)."""
    if len(position) != 2:
        raise ValueError('positions has to have 2 coordinates')
    if len(ray_features) <= 2:
        raise ValueError('required at least 2 features')
    ray_features = np.asarray(ray_features, float)
    angles = np.linspace(0, 2 * np.pi, len(ray_features), endpoint=False)
    angles = (np.pi / 2.0) - angles - np.deg2rad(shift)
    mask = (ray_features >= 0) & ~np.isinf(ray_features)
    angles = angles[mask]
    rays = ray_features[mask]
    dx = np.cos(angles) * rays
    dy = np.sin(angles) * rays
    return np.tile(position, (len(rays), 1)) + np.stack([dx, dy], axis=1)


def reduce_close_points(points, dist_thr):
    """Greedy removal of points closer than a threshold
    (`descriptors.py:2005-2041`)."""
    from scipy import spatial
    points = np.asarray(points)
    if len(points) <= 2:
        raise ValueError('too few point to be reduced')
    dist = spatial.distance.cdist(points, points)
    np.fill_diagonal(dist, np.inf)
    while np.min(dist) < dist_thr and len(points) > 0:
        coord = np.unravel_index(dist.argmin(), dist.shape)
        i = max(coord)
        points = np.delete(points, i, axis=0)
        dist = np.delete(np.delete(dist, i, axis=0), i, axis=1)
    return points
