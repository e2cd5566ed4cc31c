"""RG2Sp region growing: shape priors, greedy + GraphCut solvers.

Scenarios mirror the reference's executable examples
(`/root/reference/imsegm/region_growing.py` doctests and
`/root/reference/tests/test_region-growing.py`): a rectangular object on a
regular superpixel grid must be recovered by both solvers, and the shape-prior
table lookup must reproduce the reference's bilinear interpolation values.
"""

import numpy as np
import pytest

from pyimsegm_tpu import region_growing as rg


def _grid_slic(h, w, step):
    ii, jj = np.meshgrid(np.arange(h) // step, np.arange(w) // step,
                         indexing='ij')
    ncol = int(np.ceil(w / step))
    return (ii * ncol + jj).astype(int)


CHIST = [[1.0] * 3 + [0.8, 0.7, 0.6, 0.5, 0.3, 0.1, 0.0],
         [1.0] * 3 + [0.9, 0.8, 0.7, 0.3, 0.2, 0.2, 0.1],
         [1.0] * 3 + [1.0, 0.7, 0.6, 0.5, 0.3, 0.1, 0.1],
         [1.0] * 3 + [0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.0]]


@pytest.fixture(scope='module')
def rect_scene():
    h, w, step = 15, 20, 2
    segm = np.zeros((h, w), dtype=int)
    segm[3:12, 5:17] = 1
    slic = _grid_slic(h, w, step)
    prob_fg = rg.compute_segm_prob_fg(slic, segm, [0.1, 0.9])
    return segm, slic, prob_fg


def test_shape_prior_table_cdf_values():
    # reference doctest values (`region_growing.py:601-620`)
    chist = [[1.0, 1.0, 0.8, 0.7, 0.6, 0.5, 0.3, 0.0, 0.0],
             [1.0, 1.0, 0.9, 0.8, 0.7, 0.3, 0.2, 0.2, 0.0],
             [1.0, 1.0, 1.0, 0.7, 0.6, 0.5, 0.3, 0.1, 0.1],
             [1.0, 1.0, 0.6, 0.5, 0.4, 0.3, 0.2, 0.0, 0.0]]
    centre = (1, 1)
    f = rg.compute_shape_prior_table_cdf
    assert f([1, 1], chist, centre) == pytest.approx(1.0)
    assert f([10, 10], chist, centre) == pytest.approx(0.0, abs=1e-6)
    assert f([10, -10], chist, centre) == pytest.approx(0.1, abs=1e-3)
    assert f([2, 3], chist, centre) == pytest.approx(0.806, abs=1e-2)
    assert f([-3, -2], chist, centre) == pytest.approx(0.381, abs=1e-2)
    assert f([3, -2], chist, centre) == pytest.approx(0.676, abs=1e-2)
    assert f([2, 3], chist, centre, angle_shift=270) == pytest.approx(
        0.891, abs=1e-2)


def test_compute_cumulative_distrib():
    # reference doctest (`region_growing.py:344-348`)
    cdist = rg.compute_cumulative_distrib(
        np.array([[1, 2]]), np.array([[1.5, 0.5], [0.5, 1]]),
        np.array([0.5]), 6)
    expected = np.array([[1.0, 0.67, 0.34, 0.12, 0.03, 0.0, 0.0],
                         [1.0, 0.98, 0.5, 0.02, 0.0, 0.0, 0.0]])
    assert np.allclose(np.round(cdist, 2), expected, atol=0.02)


def test_compute_centre_moment_points():
    pts = list(zip([0] * 10, np.arange(10))) + [(0, 0)] * 5
    centre, theta = rg.compute_centre_moment_points(pts)
    assert np.allclose(centre, [0., 3.])
    assert theta % 180 == 0.0
    pts = list(zip(np.arange(10), [0] * 10)) + [(10, 0)]
    _, theta = rg.compute_centre_moment_points(pts)
    assert theta % 180 == 90.0
    pts = list(zip(-np.arange(10), -np.arange(10))) + [(0, 0)] * 5
    _, theta = rg.compute_centre_moment_points(pts)
    assert theta % 180 == 45.0


def test_compute_pairwise_penalty():
    edges = np.array([[0, 1], [1, 2], [0, 3], [2, 3], [2, 4]])
    labels = np.array([0, 0, 1, 2, 1])
    out = rg.compute_pairwise_penalty(edges, labels, 0.05, 0.01)
    assert np.allclose(out, [0., 2.99573227, 2.99573227, 4.60517019, 0.])


def test_compute_segm_object_shape():
    img = np.zeros((100, 100))
    img[20:70, 30:80] = 1
    rays, _ = rg.compute_segm_object_shape(img, ray_step=45)
    # square-ish object: alternating long diagonals / short axes
    assert len(rays) == 8
    assert np.all(np.asarray(rays) > 20)
    assert np.asarray(rays).max() < 40


def test_greedy_recovers_rectangle(rect_scene):
    segm, slic, prob_fg = rect_scene
    dbg = {}
    labels = rg.region_growing_shape_slic_greedy(
        slic, prob_fg, [(7.5, 10)], (None, CHIST), coef_pairwise=0,
        debug_history=dbg)
    crit = np.asarray(dbg['criteria'])
    assert crit[0] > crit[-1]          # energy decreases
    seg_out = labels[slic]
    # recovered region must closely match the 0/1 rectangle (small SLIC grid
    # quantisation tolerated)
    inter = np.sum((seg_out == 1) & (segm == 1))
    union = np.sum((seg_out == 1) | (segm == 1))
    assert inter / union > 0.6


def test_greedy_shape_only_round(rect_scene):
    _, slic, _ = rect_scene
    segm = np.ones(slic.shape, dtype=int)
    chist = np.zeros((16, 9))
    chist[:, :5] = 1.0
    prob_fg = rg.compute_segm_prob_fg(slic, segm, [0.1, 0.9])
    labels = rg.region_growing_shape_slic_greedy(
        slic, prob_fg, [(6.5, 9)], (None, chist), coef_shape=10,
        coef_pairwise=1)
    seg_out = labels[slic]
    # a roughly disk-shaped region around the centre, radius ~5
    assert seg_out[6, 9] == 1
    assert seg_out[0, 0] == 0
    area = np.sum(seg_out == 1)
    assert 40 <= area <= 120


def test_graphcut_recovers_rectangle(rect_scene):
    segm, slic, prob_fg = rect_scene
    dbg = {}
    labels = rg.region_growing_shape_slic_graphcut(
        slic, prob_fg, [(7.5, 10)], (None, CHIST), coef_pairwise=2,
        debug_history=dbg)
    seg_out = labels[slic]
    inter = np.sum((seg_out == 1) & (segm == 1))
    union = np.sum((seg_out == 1) | (segm == 1))
    assert inter / union > 0.6


def test_object_segmentation_graphcut_slic():
    slic = np.array([[0] * 3 + [1] * 3 + [2] * 3 + [3] * 3 + [4] * 3,
                     [5] * 3 + [6] * 3 + [7] * 3 + [8] * 3 + [9] * 3])
    segm = np.array([[0] * 15, [1] * 12 + [0] * 3])
    out = rg.object_segmentation_graphcut_slic(
        slic, segm, [(1, 7)], gc_regul=0., edge_coef=1., coef_shape=1.)
    assert np.array_equal(out, [0, 0, 0, 0, 0, 1, 1, 1, 1, 0])
    out = rg.object_segmentation_graphcut_slic(
        slic, segm, [(1, 7)], gc_regul=1., edge_coef=1., debug_visual={})
    assert np.array_equal(out, [0, 0, 0, 0, 0, 1, 1, 1, 1, 0])


def test_object_segmentation_graphcut_pixels():
    segm = np.array([[0] * 10,
                     [1] * 5 + [0] * 5, [1] * 4 + [0] * 6,
                     [0] * 6 + [1] * 4, [0] * 5 + [1] * 5,
                     [0] * 10])
    centres = [(1, 2), (4, 8)]
    out = rg.object_segmentation_graphcut_pixels(segm, centres, gc_regul=0.,
                                                 coef_shape=0.5)
    # both objects found with distinct labels, background stays 0
    assert out[1, 1] == 2 or out[1, 1] == 1
    assert out[4, 8] != 0
    assert out[1, 1] != out[4, 8]
    assert out[0, 0] == 0 and out[5, 5] == 0


def test_shape_model_mixture_roundtrip():
    rng = np.random.default_rng(0)
    base = np.array([10, 8, 9, 11, 10, 9, 8, 10], float)
    list_rays = (base[None, :] + rng.normal(0, 1.0, size=(40, 8))).tolist()
    model, cdist = rg.transform_rays_model_cdf_mixture(list_rays)
    cdist = np.asarray(cdist)
    assert cdist.shape[0] == 8
    # survival function: 1 near zero distance, ~0 at the tail, monotone-ish
    assert np.all(cdist[:, 0] > 0.9)
    assert np.all(cdist[:, -1] < 0.1)
    proba = model.predict_proba([base.tolist()])
    assert proba.shape[1] >= 1
    assert np.isclose(proba.sum(), 1.0, atol=1e-5)


def test_shape_model_sets_and_kmeans():
    rng = np.random.default_rng(1)
    small = 8 + rng.normal(0, 0.5, size=(20, 8))
    large = 16 + rng.normal(0, 0.5, size=(20, 8))
    list_rays = np.vstack([small, large]).tolist()
    model, mean_cdf = rg.transform_rays_model_sets_mean_cdf_mixture(
        list_rays, 2, slic_size=1)
    assert len(mean_cdf) == 2
    model2, mean_cdf2 = rg.transform_rays_model_sets_mean_cdf_kmeans(
        list_rays, 2)
    assert len(mean_cdf2) == 2
    # kmeans separates the two scales
    centers = np.sort(model2.cluster_centers_.mean(axis=1))
    assert centers[0] < 12 < centers[1]
    _, cdist = rg.transform_rays_model_cdf_kmeans(list_rays, 2)
    assert np.asarray(cdist).shape[0] == 8


def test_shape_model_histograms():
    list_rays = [[9, 4, 9], [4, 9, 7], [9, 7, 11], [10, 8, 10],
                 [9, 11, 8], [4, 8, 5], [8, 10, 6], [9, 7, 11]]
    chist = rg.transform_rays_model_cdf_histograms(list_rays, nb_bins=5)
    chist = np.asarray(chist)
    assert chist.shape == (3, 12)
    assert np.all(chist[:, 0] == 1.0)
    assert np.all(chist[:, -1] == 0.0)
    assert np.all(np.diff(chist, axis=1) <= 1e-12)


def test_compute_segm_prob_fg():
    slic = np.array([[0, 0, 0, 0, 1, 1, 1, 1], [2, 2, 2, 2, 3, 3, 3, 3]])
    segm = np.array([0, 1, 1, 0])[slic]
    out = rg.compute_segm_prob_fg(slic, segm, [0.3, 0.8])
    assert np.allclose(out, [0.3, 0.8, 0.8, 0.3])
