"""Drawing / geometry helpers (figure builders smoke-tested headless)."""

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from pyimsegm_tpu.utils import drawing  # noqa: E402


def test_closest_point_on_line():
    out = drawing.closest_point_on_line([0, 0], [1, 2], [0, 2])
    assert np.allclose(out, [0.8, 1.6])


def test_draw_eggs_ellipse():
    mask = drawing.draw_eggs_ellipse([30, 50], [[10, 10]], [[20, 20]],
                                     [[35, 20]])
    assert mask.shape == (30, 50)
    assert mask.max() == 1
    assert mask.sum() > 20


def test_draw_eggs_rectangle_and_merge():
    masks = drawing.draw_eggs_rectangle([30, 50], [[10, 10]], [[20, 20]],
                                        [[35, 20]])
    assert len(masks) == 1
    assert masks[0].sum() > 50
    m1 = np.zeros((5, 6), dtype=int)
    m1[:4, :4] = 1
    m2 = np.zeros((5, 6), dtype=int)
    m2[2:, 2:] = 1
    merged = drawing.merge_object_masks([m1, m2])
    assert merged[0, 0] == 1 and merged[4, 5] == 2
    # identical mask is skipped
    assert drawing.merge_object_masks([m1, m1]).max() == 1


def test_parse_annot_rectangles():
    import pandas as pd
    row = pd.DataFrame([dict(ant_x=1, ant_y=2, lat_x=3, lat_y=4,
                             post_x=5, post_y=6)])
    assert drawing.parse_annot_rectangles(row) == \
        ([(1, 2)], [(3, 4)], [(5, 6)])


def test_overlap_images():
    imgs = [np.zeros((20, 20)), np.ones((20, 20))]
    opt = drawing.make_overlap_images_optical(imgs)
    assert np.allclose(opt, 0.5)
    chess = drawing.make_overlap_images_chess(imgs, chess_field=10)
    assert chess[0, 0] == 0 and chess[0, 10] == 1 and chess[10, 0] == 1


def test_figures_smoke():
    rng = np.random.default_rng(0)
    img = rng.random((30, 40, 3))
    seg = (rng.random((30, 40)) > 0.5).astype(int)
    fig = drawing.figure_image_segm_results(img, seg)
    plt.close(fig)
    fig = drawing.figure_overlap_annot_segm_image(seg, 1 - seg, img)
    plt.close(fig)
    fig = drawing.figure_image_segm_centres(img, seg, [(5, 5)])
    plt.close(fig)
    fig = drawing.figure_ellipse_fitting(
        img, seg, [(15, 20, 8, 12, 0.4)], [(15, 20)], [123.0])
    plt.close(fig)
    fig = drawing.figure_segm_boundary_dist(seg, seg)
    plt.close(fig)
    fig, ax = plt.subplots()
    drawing.draw_image_segm_points(ax, img, [(3, 4), (10, 12)], [0, 1],
                                   slic=np.arange(1200).reshape(30, 40) // 10)
    plt.close(fig)
    fig, ax = plt.subplots()
    drawing.draw_image_clusters_centers(
        ax, img[:, :, 0], np.array([(6., 7.)]), points=np.array([(5., 6.)]),
        labels_centre=np.array([0]))
    plt.close(fig)


def test_rg2sp_debug_figure():
    slic = np.arange(36).reshape(6, 6)
    dbg = {
        'labels': [np.array([0] * 18 + [1] * 18)],
        'criteria': [42.0],
        'centres': [np.array([[3, 3]])],
        'shifts': [[0.0]],
        'lut_data_cost': np.zeros((36, 2)),
        'lut_shape_cost': [np.zeros((36, 2))],
    }
    seg = (slic >= 18).astype(int)
    fig = drawing.figure_rg2sp_debug_complete(seg, slic, dbg, 0)
    plt.close(fig)


def test_graphcut_weighted_edges_render():
    segments = np.arange(16).reshape(4, 4)
    centers = [(i // 4, i % 4) for i in range(16)]
    edges = np.array([[0, 1], [1, 2], [4, 5]])
    out = drawing.draw_graphcut_weighted_edges(segments, centers, edges,
                                              np.array([1.0, 2.0, 3.0]))
    assert out.ndim == 3 and out.shape[2] == 3
