"""Multivariate Otsu thresholding on device.

Per-dimension Otsu thresholds with sign-alignment voting across dimensions,
matching `/root/reference/imsegm/graph_cuts.py:166-194`.
"""

import jax
import jax.numpy as jnp


def threshold_otsu(values, weights=None, nbins=256):
    """Classic Otsu threshold of a 1D sample (histogram-based, like
    ``skimage.filters.threshold_otsu``)."""
    if weights is None:
        weights = jnp.ones_like(values)
    lo = jnp.min(jnp.where(weights > 0, values, jnp.inf))
    hi = jnp.max(jnp.where(weights > 0, values, -jnp.inf))
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((values - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jax.ops.segment_sum(weights, idx, num_segments=nbins)
    centers = lo + (jnp.arange(nbins, dtype=values.dtype) + 0.5) / nbins * span

    w1 = jnp.cumsum(hist)
    w2 = w1[-1] - w1
    s1 = jnp.cumsum(hist * centers)
    m1 = s1 / jnp.maximum(w1, 1e-12)
    m2 = (s1[-1] - s1) / jnp.maximum(w2, 1e-12)
    between = w1 * w2 * (m1 - m2) ** 2
    between = jnp.where((w1 > 0) & (w2 > 0), between, -1.0)
    return centers[jnp.argmax(between)]


def compute_multivariate_otsu(features, sample_weight=None):
    """Binary labels by per-dim Otsu with orientation voting
    (`graph_cuts.py:166-194`); returns (N,) int32 in {0, 1}."""
    n, d = features.shape
    if sample_weight is None:
        sample_weight = jnp.ones((n,), features.dtype)
    ys = jnp.zeros((n, d), features.dtype)
    for i in range(d):
        thr = threshold_otsu(features[:, i], sample_weight)
        asign = (features[:, i] > thr).astype(features.dtype)
        if i > 0:
            m = jnp.mean(ys[:, :i], axis=1)
            d1 = jnp.mean(jnp.abs(asign - m) * sample_weight)
            d2 = jnp.mean(jnp.abs((1.0 - asign) - m) * sample_weight)
            asign = jnp.where(d2 < d1, 1.0 - asign, asign)
        ys = ys.at[:, i].set(asign)
    return (jnp.mean(ys, axis=1) > 0.5).astype(jnp.int32)
