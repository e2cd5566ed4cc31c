"""Segment-statistics parity with the reference numerics.

Golden values come from the reference doctests
(`/root/reference/imsegm/descriptors.py:218-226,391-417,429-455,796-813`) —
recomputed here with plain numpy loops as the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu import descriptors
from pyimsegm_tpu.ops import segment_stats


def _ref_image_segm():
    image = np.zeros((2, 10, 3))
    image[:, 2:6, 0] = 1
    image[:, 3:7, 1] = 3
    image[:, 4:9, 2] = 2
    segm = np.array([[0, 0, 0, 0, 0, 1, 1, 1, 1, 1],
                     [0, 0, 0, 0, 0, 1, 1, 1, 1, 1]])
    return image, segm


def test_segment_mean_matches_reference_doctest():
    image, segm = _ref_image_segm()
    out = segment_stats.segment_mean_std_energy(
        jnp.asarray(image.reshape(-1, 3), jnp.float32),
        jnp.asarray(segm.ravel(), jnp.int32), 2, flags=('mean',))
    # golden from descriptors.py:218-226 (cython_img2d_color_mean doctest)
    np.testing.assert_allclose(np.asarray(out['mean']),
                               [[0.6, 1.2, 0.4], [0.2, 1.2, 1.6]], atol=1e-6)


def test_segment_energy_matches_reference_doctest():
    image, segm = _ref_image_segm()
    image[:, 3:8, 1] = 3    # energy doctest uses 3:8 (descriptors.py:393)
    image[:, 3:7, 1] = 3
    out = segment_stats.segment_mean_std_energy(
        jnp.asarray(image.reshape(-1, 3), jnp.float32),
        jnp.asarray(segm.ravel(), jnp.int32), 2, flags=('energy',))
    ref = np.zeros((2, 3))
    for lb in range(2):
        sel = segm == lb
        ref[lb] = (image[sel] ** 2).mean(axis=0)
    np.testing.assert_allclose(np.asarray(out['energy']), ref, atol=1e-6)


def test_segment_std_population():
    rng = np.random.default_rng(0)
    image = rng.random((8, 9, 3))
    segm = rng.integers(0, 4, size=(8, 9))
    out = segment_stats.segment_mean_std_energy(
        jnp.asarray(image.reshape(-1, 3), jnp.float32),
        jnp.asarray(segm.ravel(), jnp.int32), 4, flags=('std',))
    for lb in range(4):
        sel = segm == lb
        np.testing.assert_allclose(np.asarray(out['std'])[lb],
                                   image[sel].std(axis=0), atol=1e-5)


def test_segment_median():
    rng = np.random.default_rng(1)
    image = rng.random((10, 12, 3))
    segm = rng.integers(0, 5, size=(10, 12))
    med = segment_stats.segment_median(
        jnp.asarray(image.reshape(-1, 3), jnp.float32),
        jnp.asarray(segm.ravel(), jnp.int32), 6)
    for lb in range(5):
        sel = segm == lb
        np.testing.assert_allclose(np.asarray(med)[lb],
                                   np.median(image[sel], axis=0), atol=1e-6)
    # empty segment -> zeros
    np.testing.assert_allclose(np.asarray(med)[5], 0.0)


def test_mean_grad_matches_numpy_gradient():
    rng = np.random.default_rng(2)
    image = rng.random((7, 9, 3))
    segm = rng.integers(0, 3, size=(7, 9))
    feats = segment_stats.compute_channel_statistics(
        jnp.asarray(image, jnp.float32), jnp.asarray(segm.ravel(), jnp.int32),
        3, ('meanGrad',))
    grad = np.zeros_like(image)
    for c in range(3):
        grad[..., c] = np.sum(np.gradient(image[..., c]), axis=0)
    for lb in range(3):
        sel = segm == lb
        np.testing.assert_allclose(np.asarray(feats)[lb],
                                   grad[sel].mean(axis=0), atol=1e-5)


def test_feature_ordering_and_names_match_reference():
    """Stat-major ordering & naming as `descriptors.py:804-813`."""
    image, segm = _ref_image_segm()
    feats, names = descriptors.compute_selected_features_color2d(
        jnp.asarray(image, jnp.float32), jnp.asarray(segm.ravel(), jnp.int32),
        2, {'color': ('mean', 'std', 'energy', 'median', 'meanGrad')})
    assert names == [
        'color-ch1_mean', 'color-ch2_mean', 'color-ch3_mean',
        'color-ch1_std', 'color-ch2_std', 'color-ch3_std',
        'color-ch1_energy', 'color-ch2_energy', 'color-ch3_energy',
        'color-ch1_median', 'color-ch2_median', 'color-ch3_median',
        'color-ch1_meanGrad', 'color-ch2_meanGrad', 'color-ch3_meanGrad']
    # golden row from the reference doctest (descriptors.py:811-813)
    np.testing.assert_allclose(
        np.round(np.asarray(feats), 1)[0],
        [0.6, 1.2, 0.4, 0.5, 1.5, 0.8, 0.6, 3.6, 0.8, 1.0, 0.0, 0.0, 0.2, 0.6, 0.4],
        atol=1e-6)


def test_color_space_features():
    rng = np.random.default_rng(3)
    image = rng.random((6, 8, 3)).astype(np.float32)
    segm = rng.integers(0, 3, size=(6, 8))
    feats, names = descriptors.compute_selected_features_color2d(
        jnp.asarray(image), jnp.asarray(segm.ravel(), jnp.int32), 3,
        {'color_hsv': ('mean',)})
    assert names == ['hsv-ch1_mean', 'hsv-ch2_mean', 'hsv-ch3_mean']
    assert np.isfinite(np.asarray(feats)).all()


def test_feature_names_helper():
    names = descriptors.feature_names({'color': ('mean', 'std')})
    assert len(names) == 6
    names_t = descriptors.feature_names({'tLM_short': ('mean',)})
    assert len(names_t) == 15 * 3  # 3 sigmas x 5 batteries x 3 channels
