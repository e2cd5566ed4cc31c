"""Multi-object morphological active contours (ACWE / Chan-Vese) on device.

TPU-native counterpart of the external `morphsnakes` package used by the
reference's egg-segmentation zoo (`run_ovary_egg-segmentation.py:335-361`:
``multi_snakes.MultiMorphSnakes(img, mask, morphsnakes.MorphACWE, ...)``).

All N object level sets evolve together as one (N, H, W) tensor: the ACWE
region forcing is elementwise, the morphological gradient / curvature
smoothing are 3x3 window reductions (``lax.reduce_window``), and the whole
evolution is a single ``lax.fori_loop`` — one fused XLA program, no
host round-trips per iteration.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pool(u, op, init):
    """3x3 window reduction over the trailing two axes of (N, H, W)."""
    return jax.lax.reduce_window(u, init, op, (1, 3, 3), (1, 1, 1),
                                 'SAME')


def _dilate(u):
    return _pool(u, jax.lax.max, -jnp.inf)


def _erode(u):
    return _pool(u, jax.lax.min, jnp.inf)


def _curvature_smooth(u, threshold):
    """One binary median-flow step: 3x3 majority vote (the classic
    approximation of the SI/IS curvature operators in morphological
    snakes); ``threshold`` alternates 4/5 to balance shrink/grow bias."""
    s = _pool(u, jax.lax.add, 0.0)
    return (s >= threshold).astype(u.dtype)


@functools.partial(jax.jit, static_argnames=('n_iter', 'smoothing'))
def _acwe_evolve(image, u0, n_iter, smoothing, lambda1, lambda2):
    image = image.astype(jnp.float32)

    def body(it, u):
        # region statistics: per-object inside mean, shared background mean
        inside_sum = jnp.sum(u * image, axis=(1, 2))
        inside_cnt = jnp.maximum(jnp.sum(u, axis=(1, 2)), 1.0)
        c1 = inside_sum / inside_cnt                            # (N,)
        bg = 1.0 - jnp.max(u, axis=0)
        c2 = jnp.sum(bg * image) / jnp.maximum(jnp.sum(bg), 1.0)

        # ACWE forcing on the boundary band (morphological gradient > 0)
        grad = _dilate(u) - _erode(u)
        d_in = (image[None] - c1[:, None, None]) ** 2
        d_out = (image[None] - c2) ** 2
        aux = grad * (lambda1 * d_in - lambda2 * d_out)
        u = jnp.where(aux < 0, 1.0, jnp.where(aux > 0, 0.0, u))

        # curvature smoothing, alternating majority thresholds
        for s in range(smoothing):
            thr = jnp.where((it + s) % 2 == 0, 5.0, 4.0)
            u = _curvature_smooth(u, thr)

        # multi-object exclusion: a contested pixel goes to the object
        # whose inside mean matches it best
        claims = jnp.sum(u, axis=0)
        best = jnp.argmin(jnp.where(u > 0, d_in, jnp.inf), axis=0)
        keep = (claims <= 1) | (best[None] == jnp.arange(u.shape[0])[:, None, None])
        return u * keep.astype(u.dtype)

    return jax.lax.fori_loop(0, n_iter, body, u0.astype(jnp.float32))


def morph_acwe_multi(image, init_masks, n_iter=200, smoothing=1,
                     lambda1=1.0, lambda2=1.0):
    """Evolve N morphological Chan-Vese level sets jointly.

    :param image: (H, W) float array
    :param init_masks: (N, H, W) binary initial level sets
    :param n_iter: evolution steps (static)
    :param smoothing: curvature-smoothing passes per step (static)
    :returns: (H, W) int32 label map, 0 = background, 1..N = objects
    """
    image = jnp.asarray(np.asarray(image), jnp.float32)
    u0 = jnp.asarray(np.asarray(init_masks), jnp.float32)
    u = _acwe_evolve(image, u0, int(n_iter), int(smoothing),
                     float(lambda1), float(lambda2))
    labels = jnp.where(jnp.max(u, axis=0) > 0,
                       jnp.argmax(u, axis=0) + 1, 0)
    return labels.astype(jnp.int32)


def circle_masks(shape, centers, radius=15):
    """(N, H, W) binary disks around the given (row, col) centres — the
    reference's circle initialisation (`run_ovary_egg-segmentation.py:278`)."""
    h, w = shape
    yy, xx = np.mgrid[:h, :w]
    masks = np.zeros((len(centers), h, w), np.float32)
    for i, c in enumerate(centers):
        masks[i] = (((yy - float(c[0])) ** 2 + (xx - float(c[1])) ** 2)
                    <= radius ** 2)
    return masks
