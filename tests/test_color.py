"""Color conversion sanity checks against known fixed points."""

import numpy as np

from pyimsegm_tpu.ops import color


def test_rgb2lab_white_black():
    white = color.rgb2lab(np.ones((1, 1, 3), np.float32))
    np.testing.assert_allclose(np.asarray(white)[0, 0], [100, 0, 0], atol=0.1)
    black = color.rgb2lab(np.zeros((1, 1, 3), np.float32))
    np.testing.assert_allclose(np.asarray(black)[0, 0], [0, 0, 0], atol=0.1)


def test_rgb2lab_primary_red():
    red = np.zeros((1, 1, 3), np.float32)
    red[..., 0] = 1
    lab = np.asarray(color.rgb2lab(red))[0, 0]
    # canonical sRGB red in CIELAB (D65): L~53.2, a~80.1, b~67.2
    np.testing.assert_allclose(lab, [53.24, 80.09, 67.2], atol=0.5)


def test_rgb2hsv_known_values():
    x = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]]], np.float32)
    hsv = np.asarray(color.rgb2hsv(x))[0]
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[1], [1 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[2], [2 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[3], [0.0, 0.0, 0.5], atol=1e-6)


def test_rgb2gray_weights():
    x = np.ones((2, 2, 3), np.float32)
    np.testing.assert_allclose(np.asarray(color.rgb2gray(x)), 1.0, atol=1e-4)


def test_rgb2luv_white():
    luv = np.asarray(color.rgb2luv(np.ones((1, 1, 3), np.float32)))[0, 0]
    np.testing.assert_allclose(luv, [100, 0, 0], atol=0.2)


def test_hed_roundtrip_finite():
    rng = np.random.default_rng(0)
    x = rng.random((4, 4, 3)).astype(np.float32)
    hed = np.asarray(color.rgb2hed(x))
    assert np.isfinite(hed).all()
