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


def disk_count_maps(planes, radius):
    """For every pixel of every plane: sum within a disk of ``radius`` —
    an O(radius * H * W) cumsum decomposition of the disk convolution
    (disk = union of horizontal chords).  TPU-shaped: every scan step is
    two *contiguous* dynamic slices of the padded row cumsum (the clipped
    window bounds are realised by zero / row-total padding) plus two row
    shifts — no per-element gathers anywhere — and the +dy / -dy chords
    share one slice pair (equal widths), so the scan runs ``radius + 1``
    steps, not ``2 * radius + 1``.

    :param planes: (..., H, W) float — any leading batch axes
    :returns: (..., H, W) float counts
    """
    h, w = planes.shape[-2:]
    r = int(radius)
    cs = jnp.cumsum(planes, axis=-1)                      # (..., H, W)
    total = cs[..., -1:]
    # padded prefix sums: index r+j holds "sum of first j" for j in [0, W],
    # zeros below (window clipped at the left edge), row totals above
    # (clipped at the right edge)
    cs_pad = jnp.concatenate(
        [jnp.zeros(planes.shape[:-1] + (r + 1,), planes.dtype), cs,
         jnp.broadcast_to(total, planes.shape[:-1] + (r,))], axis=-1)

    half = [(dy, wd) for dy, wd in _row_widths(radius) if dy >= 0]
    dys = jnp.asarray([dy for dy, _ in half], jnp.int32)
    widths = jnp.asarray([wd for _, wd in half], jnp.int32)
    zrows = jnp.zeros(planes.shape[:-2] + (r, w), planes.dtype)

    def step(acc, dy_width):
        dy, width = dy_width
        hi = jax.lax.dynamic_slice_in_dim(cs_pad, r + 1 + width, w, axis=-1)
        lo = jax.lax.dynamic_slice_in_dim(cs_pad, r - width, w, axis=-1)
        chord = hi - lo                                   # (..., H, W)
        cp = jnp.concatenate([zrows, chord, zrows], axis=-2)
        up = jax.lax.dynamic_slice_in_dim(cp, r + dy, h, axis=-2)
        down = jax.lax.dynamic_slice_in_dim(cp, r - dy, h, axis=-2)
        return acc + jnp.where(dy > 0, up + down, up), None

    out, _ = jax.lax.scan(step, jnp.zeros(planes.shape, planes.dtype),
                          (dys, widths))
    return out


def disk_count_map(plane, radius):
    """Single-plane :func:`disk_count_maps`."""
    return disk_count_maps(plane, radius)
