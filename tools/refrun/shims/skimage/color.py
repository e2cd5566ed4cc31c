"""Color-space conversions (numpy, from the standard published formulas:
sRGB <-> CIE XYZ (D65, 2deg observer) <-> CIELAB / CIELUV, HSV, and the
Ruifrok-Johnston H&E-DAB stain separation).  API-compatible subset of
``skimage.color`` for running the reference."""

import numpy as np

# sRGB (linear) -> XYZ, D65
_RGB2XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
])
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_WHITE = _RGB2XYZ.sum(axis=1)          # D65 reference white (X_n, Y_n, Z_n)

# Ruifrok & Johnston stain vectors (Hematoxylin, Eosin, DAB), rows unit-norm
_HED_FROM_RGB = np.array([
    [0.65, 0.70, 0.29],
    [0.07, 0.99, 0.11],
    [0.27, 0.57, 0.78],
])
_HED_FROM_RGB = _HED_FROM_RGB / np.linalg.norm(_HED_FROM_RGB, axis=1,
                                               keepdims=True)
_RGB_FROM_HED = np.linalg.inv(_HED_FROM_RGB)


def _as_float(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float64) / 255.0
    return img.astype(np.float64)


def _srgb_to_linear(c):
    return np.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c > 0.0031308, 1.055 * c ** (1 / 2.4) - 0.055, 12.92 * c)


def rgb2xyz(rgb):
    return _srgb_to_linear(_as_float(rgb)) @ _RGB2XYZ.T


def xyz2rgb(xyz):
    return _linear_to_srgb(np.asarray(xyz, np.float64) @ _XYZ2RGB.T)


def _lab_f(t):
    d = 6.0 / 29.0
    return np.where(t > d ** 3, np.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_finv(u):
    d = 6.0 / 29.0
    return np.where(u > d, u ** 3, 3 * d * d * (u - 4.0 / 29.0))


def rgb2lab(rgb):
    xyz = rgb2xyz(rgb) / _WHITE
    fx, fy, fz = _lab_f(xyz[..., 0]), _lab_f(xyz[..., 1]), _lab_f(xyz[..., 2])
    return np.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                     200.0 * (fy - fz)], axis=-1)


def lab2rgb(lab):
    lab = np.asarray(lab, np.float64)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0
    xyz = np.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1)
    return xyz2rgb(xyz * _WHITE)


def rgb2luv(rgb):
    xyz = rgb2xyz(rgb)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    denom = x + 15.0 * y + 3.0 * z
    up = np.where(denom > 0, 4.0 * x / np.maximum(denom, 1e-30), 0.0)
    vp = np.where(denom > 0, 9.0 * y / np.maximum(denom, 1e-30), 0.0)
    xn, yn, zn = _WHITE
    dn = xn + 15.0 * yn + 3.0 * zn
    unp, vnp = 4.0 * xn / dn, 9.0 * yn / dn
    yr = y / yn
    lum = np.where(yr > (6.0 / 29.0) ** 3,
                   116.0 * np.cbrt(yr) - 16.0, (29.0 / 3.0) ** 3 * yr)
    return np.stack([lum, 13.0 * lum * (up - unp),
                     13.0 * lum * (vp - vnp)], axis=-1)


def luv2rgb(luv):
    luv = np.asarray(luv, np.float64)
    lum, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    xn, yn, zn = _WHITE
    dn = xn + 15.0 * yn + 3.0 * zn
    unp, vnp = 4.0 * xn / dn, 9.0 * yn / dn
    safe_l = np.maximum(lum, 1e-30)
    up = u / (13.0 * safe_l) + unp
    vp = v / (13.0 * safe_l) + vnp
    y = yn * np.where(lum > 8.0, ((lum + 16.0) / 116.0) ** 3,
                      lum * (3.0 / 29.0) ** 3)
    x = y * 9.0 * up / np.maximum(4.0 * vp, 1e-30)
    z = y * (12.0 - 3.0 * up - 20.0 * vp) / np.maximum(4.0 * vp, 1e-30)
    return xyz2rgb(np.stack([x, y, z], axis=-1))


def rgb2hsv(rgb):
    rgb = _as_float(rgb)
    mx = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    delta = mx - mn
    safe = np.where(delta > 0, delta, 1.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    h = np.where(mx == r, (g - b) / safe % 6.0,
                 np.where(mx == g, (b - r) / safe + 2.0,
                          (r - g) / safe + 4.0)) / 6.0
    h = np.where(delta > 0, h, 0.0)
    s = np.where(mx > 0, delta / np.maximum(mx, 1e-30), 0.0)
    return np.stack([h, s, mx], axis=-1)


def hsv2rgb(hsv):
    hsv = np.asarray(hsv, np.float64)
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h).astype(int) % 6
    f = h - np.floor(h)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    choices = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, t], -1), np.stack([p, q, v], -1),
        np.stack([t, p, v], -1), np.stack([v, p, q], -1)], axis=0)
    return np.take_along_axis(choices, i[None, ..., None], axis=0)[0]


def rgb2hed(rgb):
    rgb = np.maximum(_as_float(rgb), 1e-6)
    od = -np.log10(rgb)                  # optical density
    return od @ _RGB_FROM_HED.T


def hed2rgb(hed):
    od = np.asarray(hed, np.float64) @ _HED_FROM_RGB.T
    return np.clip(10.0 ** (-od), 0.0, 1.0)


def rgb2gray(rgb):
    rgb = _as_float(rgb)
    if rgb.ndim == 2:
        return rgb
    # ITU-R BT.709 luma weights (what skimage uses)
    return rgb[..., :3] @ np.array([0.2125, 0.7154, 0.0721])


def gray2rgb(gray):
    gray = np.asarray(gray)
    return np.stack([gray] * 3, axis=-1)


def label2rgb(label, image=None, kind='overlay', bg_label=-1, **_kw):
    """Subset: 'avg' paints each region with its mean image color;
    'overlay' tints regions with a rotating palette."""
    label = np.asarray(label)
    if kind == 'avg' and image is not None:
        image = _as_float(image)
        if image.ndim == 2:
            image = gray2rgb(image)
        out = np.zeros(label.shape + (3,), np.float64)
        for lb in np.unique(label):
            m = label == lb
            out[m] = image[m].reshape(-1, 3).mean(axis=0)
        return out
    palette = np.array([
        [0.89, 0.10, 0.11], [0.22, 0.49, 0.72], [0.30, 0.69, 0.29],
        [0.60, 0.31, 0.64], [1.00, 0.50, 0.00], [1.00, 1.00, 0.20],
        [0.65, 0.34, 0.16], [0.97, 0.51, 0.75]])
    out = np.zeros(label.shape + (3,), np.float64)
    for i, lb in enumerate(np.unique(label)):
        if lb == bg_label:
            continue
        out[label == lb] = palette[i % len(palette)]
    if image is not None:
        image = _as_float(image)
        if image.ndim == 2:
            image = gray2rgb(image)
        out = 0.5 * out + 0.5 * image
    return out
