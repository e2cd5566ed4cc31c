"""Filters subset for running the reference."""

import numpy as np
from scipy import ndimage


def threshold_otsu(image, nbins=256):
    """Otsu threshold by exhaustive inter-class variance maximisation over
    histogram bin edges."""
    vals = np.asarray(image).ravel()
    vals = vals[np.isfinite(vals)]
    hist, edges = np.histogram(vals, bins=nbins)
    mids = (edges[:-1] + edges[1:]) / 2.0
    w = hist.astype(np.float64)
    cum_w = np.cumsum(w)
    cum_wm = np.cumsum(w * mids)
    total_w, total_wm = cum_w[-1], cum_wm[-1]
    w0 = cum_w[:-1]
    w1 = total_w - w0
    valid = (w0 > 0) & (w1 > 0)
    mu0 = np.where(valid, cum_wm[:-1] / np.maximum(w0, 1), 0)
    mu1 = np.where(valid, (total_wm - cum_wm[:-1]) / np.maximum(w1, 1), 0)
    between = np.where(valid, w0 * w1 * (mu0 - mu1) ** 2, -1)
    return mids[int(np.argmax(between))]


def gaussian(image, sigma=1.0, channel_axis=None, **_kw):
    image = np.asarray(image, np.float64)
    if channel_axis is not None or (image.ndim == 3 and image.shape[-1] <= 4):
        sig = [sigma] * (image.ndim - 1) + [0]
        return ndimage.gaussian_filter(image, sig)
    return ndimage.gaussian_filter(image, sigma)


def sobel(image):
    image = np.asarray(image, np.float64)
    gy = ndimage.sobel(image, axis=0)
    gx = ndimage.sobel(image, axis=1)
    return np.hypot(gy, gx) / 4.0
