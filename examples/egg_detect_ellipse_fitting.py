"""Egg detection by RANSAC ellipse fitting with a segmentation criterion.

Mirrors `/root/reference/notebooks/egg-detect_ellipse-fitting.ipynb`: from a
4-class tissue segmentation and annotated egg centres, extract boundary
points by ray casting (background/foreground edges), then fit one ellipse
per centre with RANSAC whose model selection maximises the area likelihood
of the covered tissue classes rather than the inlier count.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from apps.run_center_candidate_training import load_center_annotation  # noqa: E402
from pyimsegm_tpu import ellipse_fitting as ell_fit  # noqa: E402
from pyimsegm_tpu.utils import data_io, data_samples, drawing  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), 'output')
BASE = os.path.join(data_samples.PATH_DATA_IMAGES, 'drosophila_ovary_slice')
NAME = 'insitu4174'
# per-tissue-class foreground probability (background, cytoplasm, nurse, folicle)
TABLE_PROB = [0.01, 0.95, 0.95, 0.85]


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    seg, _ = data_io.load_image_2d(os.path.join(BASE, 'segm', NAME + '.png'))
    img, _ = data_io.load_image_2d(os.path.join(BASE, 'image', NAME + '.jpg'))
    centres = load_center_annotation(
        os.path.join(BASE, 'center_levels', NAME + '.csv'))
    print('segm %s, %d annotated centres' % (seg.shape, len(centres)))

    slic, points_all, labels = ell_fit.get_slic_points_labels(
        seg, slic_size=15, slic_regul=0.1)
    weights = np.bincount(slic.ravel())
    points_centers = ell_fit.prepare_boundary_points_ray_edge(
        seg, centres, close_points=5)

    segm_obj = np.zeros(seg.shape, dtype=int)
    fitted, fitted_centres = [], []
    for i, points in enumerate(points_centers):
        points = np.asarray(points)
        if len(points) < 6:
            continue
        model, inliers = ell_fit.ransac_segm(
            points, ell_fit.EllipseModelSegm, points_all, weights, labels,
            [TABLE_PROB], 0.35, 3, max_trials=10 if quick else 30)
        if model is None:
            continue
        fitted.append(model.params)
        fitted_centres.append(centres[i])
        segm_obj = ell_fit.add_overlap_ellipse(segm_obj, model.params, i + 1,
                                               thr_overlap=0.45)
    print('fitted %d ellipses; params (xc, yc, a, b, theta):' % len(fitted))
    for p in fitted:
        print('  (%.0f, %.0f, %.0f, %.0f, %.2f)' % tuple(p))

    fig = drawing.figure_ellipse_fitting(img[:, :, 0], seg, fitted,
                                         fitted_centres,
                                         crits=[0.] * len(fitted))
    fig.savefig(os.path.join(OUT, 'ellipse_fitting.png'), dpi=90)
    print('wrote', os.path.join(OUT, 'ellipse_fitting.png'))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
