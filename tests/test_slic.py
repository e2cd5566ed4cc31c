"""SLIC superpixel tests: geometry, coverage, quality on synthetic images."""

import numpy as np
import pytest

from pyimsegm_tpu.ops import slic as slic_ops
from pyimsegm_tpu.utils import data_samples
from pyimsegm_tpu.utils.metrics import adjusted_rand_score


def test_slic_config_geometry():
    cfg = slic_ops.slic_config(100, 150, 20)
    assert cfg.step == 20
    assert cfg.grid_h == 5 and cfg.grid_w == 8
    assert cfg.pad_h >= 100 and cfg.pad_w >= 150
    # reference mapping: n_segments ~ npix / size^2 (superpixels.py:57)
    assert abs(cfg.n_segments - 100 * 150 / 20 ** 2) / (100 * 150 / 400) < 0.2


def test_compactness_mapping():
    # (sp_size * regul) ** 1.5, superpixels.py:58
    assert slic_ops.compactness_from_regul(20, 0.2) == pytest.approx(4.0 ** 1.5)


import functools


@functools.lru_cache(maxsize=1)
def _device_slic_fixture():
    """One real-image SLIC solve shared by the contract tests below — the
    (shape, sp_size) matches `segment_slic_img2d`'s internal calls so the
    jitted SLIC program compiles once per session on this 1-core rig."""
    import jax.numpy as jnp

    from pyimsegm_tpu.ops import grid as grid_ops

    img = data_samples.load_sample_image()[:300, :400]
    cfg = slic_ops.slic_config(300, 400, 25)
    m = slic_ops.compactness_from_regul(25, 0.2)
    raw = np.asarray(slic_ops.slic_segment(jnp.asarray(img), cfg, m))
    enforced = np.asarray(grid_ops.enforce_grid_connectivity(
        jnp.asarray(raw), cfg))
    return img, cfg, raw, enforced


def test_slic_shapes_and_range():
    img, cfg, _raw, _enf = _device_slic_fixture()
    labels = slic_ops.segment_slic_img2d(img, sp_size=25, relative_compact=0.2)
    assert labels.shape == img.shape[:2]
    assert labels.min() >= 0 and labels.max() < cfg.n_segments


@pytest.mark.slow
def test_slic_gray_input():
    rng = np.random.default_rng(0)
    img = rng.random((150, 100)).astype(np.float32)
    labels = slic_ops.segment_slic_img2d(img, sp_size=20, relative_compact=0.2)
    assert labels.shape == (150, 100)


@pytest.mark.slow
def test_slic_compact_superpixels_are_local():
    """With strong regularisation, superpixels stay near their seed tiles."""
    rng = np.random.default_rng(1)
    img = rng.random((120, 120, 3)).astype(np.float32)
    labels = slic_ops.segment_slic_img2d(img, sp_size=20, relative_compact=0.9)
    cfg = slic_ops.slic_config(120, 120, 20)
    ys, xs = np.mgrid[:120, :120]
    for lb in np.unique(labels):
        ty, tx = lb // cfg.grid_w, lb % cfg.grid_w
        cy, cx = (ty + 0.5) * 20, (tx + 0.5) * 20
        sel = labels == lb
        # all pixels within ~2 steps of the seed centre
        assert np.abs(ys[sel] - cy).max() < 45
        assert np.abs(xs[sel] - cx).max() < 45


@pytest.mark.slow
def test_slic_respects_color_boundaries():
    """Superpixels should not straddle a sharp color boundary."""
    img, seg = data_samples.sample_color_image_rand_segment((90, 120), 3, rand_seed=0)
    labels = slic_ops.segment_slic_img2d(img, sp_size=15, relative_compact=0.2)
    # each superpixel should be (almost) pure w.r.t. the ground-truth strip
    purity = []
    for lb in np.unique(labels):
        vals, cnts = np.unique(seg[labels == lb], return_counts=True)
        purity.append(cnts.max() / cnts.sum())
    assert np.mean(purity) > 0.95


@pytest.mark.slow
def test_slic_slico_variant_runs():
    rng = np.random.default_rng(2)
    img = rng.random((80, 80, 3)).astype(np.float32)
    labels = slic_ops.segment_slic_img2d(img, sp_size=16, relative_compact=0.2,
                                         slico=True)
    assert labels.shape == (80, 80)
    assert len(np.unique(labels)) > 4


@pytest.mark.slow
def test_slic_upsamples_pixel_labels_consistently():
    """Pixel -> superpixel map must reconstruct classwise segmentation well."""
    img, seg = data_samples.sample_color_image_rand_segment((120, 150), 3, rand_seed=3)
    labels = slic_ops.segment_slic_img2d(img, sp_size=20, relative_compact=0.3)
    # majority-vote class per superpixel then upsample
    k = labels.max() + 1
    lut = np.zeros(k, dtype=int)
    for lb in range(k):
        sel = labels == lb
        if sel.any():
            lut[lb] = np.bincount(seg[sel]).argmax()
    recon = lut[labels]
    assert adjusted_rand_score(recon, seg) > 0.9


def test_enforce_grid_connectivity_device():
    """Device enforcement must yield single-component superpixels while
    preserving the 3x3-tile grid guarantee (reference semantics:
    skimage ``enforce_connectivity=True``, `superpixels.py:61-63`)."""
    from scipy import ndimage

    img, cfg, raw, enforced = _device_slic_fixture()

    n_multi = sum(ndimage.label(enforced == lb)[1] > 1
                  for lb in np.unique(enforced))
    assert n_multi == 0
    # grid guarantee: every label inside its pixel's 3x3 seed window
    ty = np.arange(img.shape[0])[:, None] // cfg.step
    tx = np.arange(img.shape[1])[None, :] // cfg.step
    assert (np.abs(enforced // cfg.grid_w - ty) <= 1).all()
    assert (np.abs(enforced % cfg.grid_w - tx) <= 1).all()
    # enforcement only relabels fragments — the bulk of pixels is unchanged
    assert (raw == enforced).mean() > 0.95
