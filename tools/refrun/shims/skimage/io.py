"""Image IO subset (PIL-backed) for running the reference."""

import numpy as np
from PIL import Image


def imread(path, **_kw):
    img = Image.open(path)
    arr = np.asarray(img)
    return arr


def imsave(path, arr, **_kw):
    arr = np.asarray(arr)
    if arr.dtype in (np.float32, np.float64):
        arr = np.clip(arr, 0, 1) if arr.max() <= 1.0 else np.clip(arr, 0, 255)
        if arr.max() <= 1.0:
            arr = (arr * 255).astype(np.uint8)
        else:
            arr = arr.astype(np.uint8)
    elif arr.dtype != np.uint8:
        mx = arr.max() if arr.size else 1
        arr = (arr.astype(np.float64) * (255.0 / max(mx, 1))).astype(np.uint8) \
            if mx > 255 else arr.astype(np.uint8)
    Image.fromarray(arr).save(path)
