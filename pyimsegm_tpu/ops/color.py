"""Color-space conversions as pure jax.numpy ops.

The reference converts RGB images with ``skimage.color`` before computing
per-superpixel statistics (`imsegm/utilities/data_io.py:28-43`,
`imsegm/descriptors.py:1244-1251`).  Here every conversion is an elementwise
jnp expression so XLA fuses it straight into the downstream segment
reductions; all functions accept float arrays in [0, 1] of shape (..., 3).
"""

import jax.numpy as jnp

# sRGB <-> linear-RGB companding and the D65 RGB->XYZ matrix (IEC 61966-2-1).
_RGB2XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=jnp.float32)

# D65 reference white for CIE Lab / Luv.
_XN, _YN, _ZN = 0.95047, 1.0, 1.08883

# Ruifrok & Johnston H&E-DAB stain separation matrix (rows = stains in RGB-OD
# space); the same constants used by skimage.color.hed2rgb/rgb2hed.
_HED_RGB = jnp.array([
    [0.65, 0.70, 0.29],
    [0.07, 0.99, 0.11],
    [0.27, 0.57, 0.78],
], dtype=jnp.float32)
import numpy as _np_
_HED_FROM_RGB = jnp.asarray(
    _np_.linalg.inv(_np_.array([[0.65, 0.70, 0.29],
                                [0.07, 0.99, 0.11],
                                [0.27, 0.57, 0.78]], _np_.float64)),
    jnp.float32)


def _srgb_to_linear(rgb):
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)


def rgb2xyz(rgb):
    lin = _srgb_to_linear(rgb)
    return lin @ _RGB2XYZ.T


def _lab_f(t):
    eps = (6.0 / 29.0) ** 3
    return jnp.where(t > eps, jnp.cbrt(t), t / (3 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)


def rgb2lab(rgb):
    xyz = rgb2xyz(rgb)
    fx = _lab_f(xyz[..., 0] / _XN)
    fy = _lab_f(xyz[..., 1] / _YN)
    fz = _lab_f(xyz[..., 2] / _ZN)
    lum = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([lum, a, b], axis=-1)


def rgb2luv(rgb):
    xyz = rgb2xyz(rgb)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    denom = x + 15.0 * y + 3.0 * z
    denom = jnp.where(denom == 0, 1.0, denom)
    up = 4.0 * x / denom
    vp = 9.0 * y / denom
    un = 4.0 * _XN / (_XN + 15.0 * _YN + 3.0 * _ZN)
    vn = 9.0 * _YN / (_XN + 15.0 * _YN + 3.0 * _ZN)
    yr = y / _YN
    lum = jnp.where(yr > (6.0 / 29.0) ** 3, 116.0 * jnp.cbrt(yr) - 16.0, (29.0 / 3.0) ** 3 * yr)
    u = 13.0 * lum * (up - un)
    v = 13.0 * lum * (vp - vn)
    return jnp.stack([lum, u, v], axis=-1)


def rgb2hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    delta = v - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        v == r, (g - b) / safe,
        jnp.where(v == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(v == 0, 0.0, delta / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def rgb2hed(rgb):
    od = -jnp.log10(jnp.maximum(rgb, 1e-6))
    return od @ _HED_FROM_RGB.T.astype(od.dtype)


def rgb2gray(rgb):
    # ITU-R BT.601 luma weights (as skimage.color.rgb2gray).
    return rgb @ jnp.array([0.2125, 0.7154, 0.0721], dtype=rgb.dtype)


#: conversions selectable by name in feature flags like ``color_lab``
#: (reference option space at `imsegm/utilities/data_io.py:28-43`).
CONVERT_FROM_RGB = {
    'rgb': lambda x: x,
    'xyz': rgb2xyz,
    'lab': rgb2lab,
    'luv': rgb2luv,
    'hsv': rgb2hsv,
    'hed': rgb2hed,
}


def convert_img_color_from_rgb(image, color_space):
    """Convert an RGB float image to the named color space."""
    if color_space not in CONVERT_FROM_RGB:
        raise ValueError('unknown color space: %r (have %r)' % (color_space, sorted(CONVERT_FROM_RGB)))
    return CONVERT_FROM_RGB[color_space](image)


# ------------------------------------------------------------- inverses ----
# (reference `DICT_CONVERT_COLOR_TO_RGB`, `imsegm/utilities/data_io.py:36-43`)

def _linear_to_srgb(lin):
    lin = jnp.clip(lin, 0.0, 1.0)
    return jnp.where(lin > 0.0031308, 1.055 * lin ** (1 / 2.4) - 0.055, 12.92 * lin)


import numpy as _np

# inverses precomputed in float64 (float32 jnp.linalg.inv loses ~1e-2 here)
_XYZ2RGB = jnp.asarray(_np.linalg.inv(_np.asarray(_RGB2XYZ, _np.float64)),
                       jnp.float32)
_RGB_FROM_HED = jnp.asarray(_np.asarray(_HED_RGB, _np.float64),
                            jnp.float32)


def xyz2rgb(xyz):
    lin = xyz @ _XYZ2RGB.T.astype(xyz.dtype)
    return _linear_to_srgb(lin)


def _lab_f_inv(t):
    delta = 6.0 / 29.0
    return jnp.where(t > delta, t ** 3, 3 * delta ** 2 * (t - 4.0 / 29.0))


def lab2rgb(lab):
    lum, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (lum + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_XN * _lab_f_inv(fx), _YN * _lab_f_inv(fy),
                     _ZN * _lab_f_inv(fz)], axis=-1)
    return xyz2rgb(xyz)


def luv2rgb(luv):
    lum, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    un = 4.0 * _XN / (_XN + 15.0 * _YN + 3.0 * _ZN)
    vn = 9.0 * _YN / (_XN + 15.0 * _YN + 3.0 * _ZN)
    safe_l = jnp.where(lum == 0, 1.0, lum)
    up = u / (13.0 * safe_l) + un
    vp = v / (13.0 * safe_l) + vn
    y = jnp.where(lum > 8.0, _YN * ((lum + 16.0) / 116.0) ** 3,
                  _YN * lum * (3.0 / 29.0) ** 3)
    safe_vp = jnp.where(vp == 0, 1.0, vp)
    x = y * 9.0 * up / (4.0 * safe_vp)
    z = y * (12.0 - 3.0 * up - 20.0 * vp) / (4.0 * safe_vp)
    xyz = jnp.stack([x, y, z], axis=-1)
    return xyz2rgb(jnp.where(lum[..., None] == 0, 0.0, xyz))


def hsv2rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode='clip')
    g = jnp.choose(i, [t, v, v, q, p, p], mode='clip')
    b = jnp.choose(i, [p, p, t, v, v, q], mode='clip')
    return jnp.stack([r, g, b], axis=-1)


def hed2rgb(hed):
    od = hed @ _HED_RGB.T.astype(hed.dtype)
    return jnp.clip(10.0 ** (-od), 0.0, 1.0)


CONVERT_TO_RGB = {
    'rgb': lambda x: x,
    'xyz': xyz2rgb,
    'lab': lab2rgb,
    'luv': luv2rgb,
    'hsv': hsv2rgb,
    'hed': hed2rgb,
}


def convert_img_color_to_rgb(image, color_space):
    """Convert an image in the named color space back to RGB
    (`imsegm/utilities/data_io.py:61-74`)."""
    if color_space not in CONVERT_TO_RGB:
        raise ValueError('unknown color space: %r (have %r)'
                         % (color_space, sorted(CONVERT_TO_RGB)))
    return CONVERT_TO_RGB[color_space](image)
