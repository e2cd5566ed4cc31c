"""Rasterisation subset (numpy) for running the reference."""

import numpy as np


def _clip_shape(rr, cc, shape, *extra):
    if shape is None:
        return (rr, cc) + extra
    keep = (rr >= 0) & (rr < shape[0]) & (cc >= 0) & (cc < shape[1])
    return (rr[keep], cc[keep]) + tuple(e[keep] for e in extra)


def disk(center, radius, shape=None):
    r0, c0 = center
    r = int(np.ceil(radius))
    rr, cc = np.mgrid[int(r0) - r:int(r0) + r + 1, int(c0) - r:int(c0) + r + 1]
    inside = (rr - r0) ** 2 + (cc - c0) ** 2 <= radius * radius
    return _clip_shape(rr[inside], cc[inside], shape)


def circle(r, c, radius, shape=None):
    # pre-0.16 skimage API: filled circle
    return disk((r, c), radius, shape=shape)


def ellipse(r, c, r_radius, c_radius, shape=None, rotation=0.0):
    rad = int(np.ceil(max(r_radius, c_radius))) + 1
    rr, cc = np.mgrid[int(r) - rad:int(r) + rad + 1,
                      int(c) - rad:int(c) + rad + 1]
    dy, dx = rr - r, cc - c
    # rotate coordinates into the ellipse frame
    ry = dy * np.cos(rotation) + dx * np.sin(rotation)
    rx = -dy * np.sin(rotation) + dx * np.cos(rotation)
    inside = (ry / r_radius) ** 2 + (rx / c_radius) ** 2 <= 1.0
    return _clip_shape(rr[inside], cc[inside], shape)


def ellipse_perimeter(r, c, r_radius, c_radius, orientation=0.0, shape=None):
    n = int(4 * np.pi * max(r_radius, c_radius)) + 8
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ry = r_radius * np.cos(t)
    rx = c_radius * np.sin(t)
    rr = np.round(r + ry * np.cos(orientation) - rx * np.sin(orientation))
    cc = np.round(c + ry * np.sin(orientation) + rx * np.cos(orientation))
    pts = np.unique(np.stack([rr, cc], 1), axis=0).astype(int)
    return _clip_shape(pts[:, 0], pts[:, 1], shape)


def line(r0, c0, r1, c1):
    n = int(max(abs(r1 - r0), abs(c1 - c0))) + 1
    rr = np.round(np.linspace(r0, r1, n)).astype(int)
    cc = np.round(np.linspace(c0, c1, n)).astype(int)
    return rr, cc


def line_aa(r0, c0, r1, c1):
    rr, cc = line(r0, c0, r1, c1)
    return rr, cc, np.ones(len(rr), np.float64)


def polygon(r, c, shape=None):
    """Filled polygon via even-odd ray casting on the bounding box grid."""
    r = np.asarray(r, np.float64)
    c = np.asarray(c, np.float64)
    rmin, rmax = int(np.floor(r.min())), int(np.ceil(r.max()))
    cmin, cmax = int(np.floor(c.min())), int(np.ceil(c.max()))
    rr, cc = np.mgrid[rmin:rmax + 1, cmin:cmax + 1]
    inside = np.zeros(rr.shape, bool)
    n = len(r)
    for i in range(n):
        r0, c0 = r[i], c[i]
        r1, c1 = r[(i + 1) % n], c[(i + 1) % n]
        crosses = ((r0 > rr) != (r1 > rr))
        with np.errstate(divide='ignore', invalid='ignore'):
            xint = c0 + (rr - r0) * (c1 - c0) / (r1 - r0)
        inside ^= crosses & (cc < xint)
    return _clip_shape(rr[inside], cc[inside], shape)
