"""Binary morphology as windowed reductions (erosion/dilation/opening/closing)
and disk structuring elements.

Stand-in for the skimage.morphology calls in the reference (disk elements for
label histograms `descriptors.py:1338`, openings in ray features
`descriptors.py:1874-1875`, and the ellipse-fitting helpers).  Dilation is a
max-reduce window with the element footprint; TPU-friendly via
``lax.reduce_window`` over shifted slices of the footprint rows.
"""


import jax
import jax.numpy as jnp
import numpy as np


def disk(radius):
    """Boolean disk footprint of given radius (skimage ``morphology.disk``
    semantics: points with L2 distance <= radius)."""
    r = int(radius)
    y, x = np.ogrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y <= r * r)


def _row_widths(radius):
    """Per-row half-widths of the disk footprint."""
    r = int(radius)
    rows = []
    for dy in range(-r, r + 1):
        w = int(np.floor(np.sqrt(max(r * r - dy * dy, 0))))
        rows.append((dy, w))
    return rows


def binary_dilation(mask, radius):
    """Dilate a boolean (H, W) mask by a disk via row-wise max windows."""
    m = mask.astype(jnp.float32)
    out = jnp.zeros_like(m)
    # horizontal max-window per row offset, then max over the row offsets
    for dy, w in _row_widths(radius):
        row_max = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 2 * w + 1), (1, 1), 'SAME')
        shifted = jnp.roll(row_max, dy, axis=0)
        if dy > 0:
            shifted = shifted.at[:dy].set(0)
        elif dy < 0:
            shifted = shifted.at[dy:].set(0)
        out = jnp.maximum(out, shifted)
    return out > 0


def binary_erosion(mask, radius):
    return ~binary_dilation(~jnp.asarray(mask, bool), radius)


def binary_opening(mask, radius):
    """opening = dilation(erosion(x)) (`skimage.morphology.opening`)."""
    return binary_dilation(binary_erosion(mask, radius), radius)


def binary_closing(mask, radius):
    return binary_erosion(binary_dilation(mask, radius), radius)


def disk_count_map(plane, radius):
    """For every pixel: sum of ``plane`` within a disk of ``radius`` —
    an O(radius * H * W) cumsum decomposition of the disk convolution
    (disk = union of horizontal runs), no big 2D kernel.  The row loop is a
    ``lax.scan`` so the compiled program stays small for any radius.

    :param plane: (H, W) float
    :returns: (H, W) float counts
    """
    h, w = plane.shape
    cs = jnp.cumsum(plane, axis=1)
    cs = jnp.concatenate([jnp.zeros((h, 1), plane.dtype), cs], axis=1)
    rows = _row_widths(radius)
    dys = jnp.asarray([dy for dy, _ in rows], jnp.int32)
    widths = jnp.asarray([wd for _, wd in rows], jnp.int32)
    xs = jnp.arange(w)
    ys = jnp.arange(h)

    def step(acc, dy_width):
        dy, width = dy_width
        hi = jnp.clip(xs + width + 1, 0, w)
        lo = jnp.clip(xs - width, 0, w)
        # rows gathered at y+dy; out-of-range rows contribute zero
        idx = ys + dy
        ok = (idx >= 0) & (idx < h)
        rs = cs[jnp.clip(idx, 0, h - 1)]
        row = (rs[:, hi] - rs[:, lo]) * ok[:, None].astype(plane.dtype)
        return acc + row, None

    out, _ = jax.lax.scan(step, jnp.zeros((h, w), plane.dtype),
                          (dys, widths))
    return out
