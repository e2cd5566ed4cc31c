"""Ellipse fit + RANSAC with segmentation criterion.

Scenarios mirror `/root/reference/imsegm/ellipse_fitting.py` doctests and
`/root/reference/tests/test_ellipse-fitting.py`.
"""

import numpy as np
import pytest

from pyimsegm_tpu import ellipse_fitting as ef


def _norm_params(params):
    """Canonical (xc, yc, major, minor, theta mod pi) for comparison."""
    xc, yc, a, b, th = params
    if b > a:
        a, b = b, a
        th = th + np.pi / 2
    return xc, yc, a, b, th % np.pi


def test_estimate_roundtrip():
    params = (20, 30, 12, 16, np.deg2rad(30))
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    model = ef.EllipseModelSegm()
    xy = model.predict_xy(t, params)
    assert model.estimate(xy)
    xc, yc, a, b, th = _norm_params(model.params)
    assert xc == pytest.approx(20, abs=0.2)
    assert yc == pytest.approx(30, abs=0.2)
    assert a == pytest.approx(16, abs=0.3)
    assert b == pytest.approx(12, abs=0.3)
    exp = _norm_params(params)[4]
    assert min(abs(th - exp), np.pi - abs(th - exp)) < 0.05
    assert np.max(np.abs(model.residuals(xy))) < 0.1


def test_residuals_offset():
    params = (20, 30, 12, 16, np.deg2rad(30))
    model = ef.EllipseModelSegm()
    xy = model.predict_xy(np.linspace(0, 2 * np.pi, 25), params)
    model.estimate(xy)
    model.params[2] += 2
    model.params[3] += 2
    res = np.abs(model.residuals(xy))
    assert np.allclose(np.round(res), 2, atol=0.5)


def test_criterion_values():
    # reference doctest (`ellipse_fitting.py:89-105`)
    seg = np.zeros((10, 15), dtype=int)
    r, c = np.meshgrid(range(seg.shape[1]), range(seg.shape[0]))
    el = ef.EllipseModelSegm()
    el.params = [4, 7, 3, 6, np.deg2rad(10)]
    weights = np.ones(seg.ravel().shape)
    table_prob = [[0.1, 0.9]]
    pts = np.array([r.ravel(), c.ravel()]).T
    seg[4:5, 6:8] = 1
    assert el.criterion(pts, weights, seg.ravel(), table_prob) == \
        pytest.approx(87.888, abs=0.1)
    seg[2:7, 4:11] = 1
    assert el.criterion(pts, weights, seg.ravel(), table_prob) == \
        pytest.approx(17.577, abs=0.1)
    seg[1:9, 1:14] = 1
    assert el.criterion(pts, weights, seg.ravel(), table_prob) == \
        pytest.approx(-70.311, abs=0.1)


def test_add_overlap_ellipse():
    seg = np.zeros((15, 20), dtype=int)
    ell = ef.add_overlap_ellipse(seg, (7, 10, 5, 8, np.deg2rad(30)), 1)
    assert ell.max() == 1
    area = np.sum(ell == 1)
    assert 0.85 * np.pi * 5 * 8 < area < 1.15 * np.pi * 5 * 8
    # big overlap -> second ellipse rejected
    ell2 = ef.add_overlap_ellipse(ell.copy(), (7, 10, 4, 6, 0.0), 2,
                                  thr_overlap=0.5)
    assert np.sum(ell2 == 2) == 0
    # disjoint small ellipse accepted
    ell3 = ef.add_overlap_ellipse(ell.copy(), (3, 3, 2, 2, 0.0), 2)
    assert np.sum(ell3 == 2) > 0


def test_split_segm_background_foreground():
    seg = np.zeros((10, 20), dtype=int)
    seg = ef.add_overlap_ellipse(seg, (5, 10, 4, 6, np.deg2rad(30)), 1)
    seg_bg, seg_fg = ef.split_segm_background_foreground(seg, 1.5, 0)
    assert seg_bg[0, 0] and not seg_bg[5, 10]
    assert seg_fg[5, 10] and not seg_fg[0, 0]
    assert not np.any(seg_bg & seg_fg)


@pytest.mark.slow
def test_ransac_segm_recovers_ellipse():
    np.random.seed(0)
    seg = np.zeros((120, 150), dtype=int)
    ell_params = 60, 75, 40, 65, np.deg2rad(30)
    seg = ef.add_overlap_ellipse(seg, ell_params, 1)
    slic, points_all, labels = ef.get_slic_points_labels(
        seg, slic_size=10, slic_regul=0.3)
    points = ef.prepare_boundary_points_ray_dist(
        seg, [(40, 90)], 2, sel_bg=1, sel_fg=0)[0]
    table_prob = [[0.01, 0.75, 0.95, 0.9], [0.99, 0.25, 0.05, 0.1]]
    weights = np.bincount(slic.ravel())
    model, inliers = ef.ransac_segm(points, ef.EllipseModelSegm, points_all,
                                    weights, labels, table_prob, 0.6, 3,
                                    max_trials=15)
    assert model is not None
    xc, yc, a, b, _ = _norm_params(model.params)
    assert xc == pytest.approx(60, abs=5)
    assert yc == pytest.approx(75, abs=5)
    assert a == pytest.approx(65, abs=6)
    assert b == pytest.approx(40, abs=6)


def test_boundary_point_extractors():
    seg = np.zeros((10, 20), dtype=int)
    seg = ef.add_overlap_ellipse(seg, (5, 10, 4, 6, np.deg2rad(30)), 1)
    pts_join = ef.prepare_boundary_points_ray_join(
        seg, [(4, 9)], 5., 3, sel_bg=1, sel_fg=0)
    assert len(pts_join[0]) >= 4
    pts_edge = ef.prepare_boundary_points_ray_edge(
        seg, [(4, 9)], 2.5, 3, sel_bg=1, sel_fg=0)
    assert len(pts_edge[0]) >= 5
    pts_mean = ef.prepare_boundary_points_ray_mean(
        seg, [(4, 9)], 2.5, 3, sel_bg=1, sel_fg=0)
    assert len(pts_mean[0]) >= 5
    # extracted points should lie near the true boundary (within ~2.5 px)
    for pts in (pts_edge[0], pts_mean[0]):
        model = ef.EllipseModelSegm()
        model.params = np.array([5, 10, 4, 6, np.deg2rad(30)])
        assert np.median(np.abs(model.residuals(pts))) < 2.5


@pytest.mark.slow
def test_prepare_boundary_points_close():
    seg = np.zeros((100, 200), dtype=int)
    seg = ef.add_overlap_ellipse(seg, (50, 100, 40, 60, np.deg2rad(30)), 1)
    pts = ef.prepare_boundary_points_close(seg, [(40, 90)])
    assert len(pts) == 1
    assert len(pts[0]) > 10
