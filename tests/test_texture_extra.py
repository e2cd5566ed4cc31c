"""Extra texture families: Gabor bank + LBP superpixel histograms."""

import numpy as np

from pyimsegm_tpu import descriptors
from pyimsegm_tpu.ops import filters as filter_ops
import pytest


def _stripe_scene(rng):
    """Vertical stripes on the left half, flat noise on the right."""
    h, w = 48, 64
    img = rng.normal(0.5, 0.02, (h, w, 3)).astype(np.float32)
    xs = np.arange(w)
    stripes = 0.25 * np.sin(2 * np.pi * xs / 6.0)
    img[:, :32, :] += stripes[None, :32, None]
    seg = np.zeros((h, w), dtype=np.int32)
    seg[:, 32:] = 1
    return img, seg


def test_gabor_bank_shapes():
    bank = filter_ops.create_filter_bank_gabor_2d(radius=8, sigmas=(2.0,),
                                                  frequencies=(0.2,),
                                                  nb_orient=4)
    assert bank.kernels.shape == (4, 17, 17)
    assert len(bank.names) == 1
    # zero-mean-ish kernels
    assert abs(bank.kernels.sum()) < 0.2


@pytest.mark.slow
def test_gabor_features_separate_texture(rng):
    img, seg = _stripe_scene(rng)
    feats, names = descriptors.compute_selected_features_color2d(
        img, seg.ravel(), 2, {'tGabor': ('mean', 'energy')})
    feats = np.asarray(feats)
    assert feats.shape[0] == 2
    assert feats.shape[1] == len(names)
    assert all(n.startswith('tGabor') for n in names)
    # energy on the striped superpixel exceeds the flat one for some battery
    energy_cols = [i for i, n in enumerate(names) if n.endswith('_energy')]
    assert np.max(feats[0, energy_cols] - feats[1, energy_cols]) > 0.0


def test_lbp_codes_uniform_bins(rng):
    x = rng.random((20, 24)).astype(np.float32)
    codes = np.asarray(filter_ops.lbp_codes(x))
    assert codes.shape == x.shape
    assert codes.min() >= 0 and codes.max() <= 9
    # constant patch -> all neighbours >= centre -> uniform code 8
    flat = np.zeros((8, 8), np.float32)
    codes_flat = np.asarray(filter_ops.lbp_codes(flat))
    assert np.all(codes_flat == 8)


def test_lbp_features_separate_texture(rng):
    img, seg = _stripe_scene(rng)
    feats, names = descriptors.compute_selected_features_color2d(
        img, seg.ravel(), 2, {'tLBP': ('hist',)})
    feats = np.asarray(feats)
    assert feats.shape == (2, len(names))
    assert np.allclose(feats.sum(axis=1), 3.0, atol=1e-4)  # 3 channels x 1
    # distributions differ between textured and flat regions
    assert np.abs(feats[0] - feats[1]).sum() > 0.1
