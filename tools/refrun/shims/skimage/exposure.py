"""Intensity rescaling subset for running the reference."""

import numpy as np


def rescale_intensity(image, in_range='image', out_range='dtype'):
    image = np.asarray(image)
    if in_range == 'image':
        lo, hi = float(image.min()), float(image.max())
    else:
        lo, hi = map(float, in_range)
    if out_range in ('float', 'dtype', 'image'):
        olo, ohi = 0.0, 1.0
    elif out_range == 'uint8':
        olo, ohi = 0.0, 255.0
    else:
        olo, ohi = map(float, out_range)
    x = np.clip(image.astype(np.float64), lo, hi)
    scaled = (x - lo) / max(hi - lo, 1e-30) * (ohi - olo) + olo
    if out_range == 'uint8':
        return np.round(scaled).astype(np.uint8)
    return scaled
