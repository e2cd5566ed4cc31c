"""Centre-detection chain: features -> classifier -> DBSCAN -> evaluation.

Mirrors the reference's center chain over synthetic blob scenes
(`/root/reference/experiments_ovary_centres/`), end-to-end but small.
"""

import numpy as np
import pytest

from pyimsegm_tpu import centers as ctr
from pyimsegm_tpu.models.clustering import dbscan

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


def _blob_scene(rng, n_blobs=3, size=(96, 128), radius=12):
    segm = np.zeros(size, dtype=int)
    centers = []
    while len(centers) < n_blobs:
        c = (rng.integers(radius + 2, size[0] - radius - 2),
             rng.integers(radius + 2, size[1] - radius - 2))
        if any((c[0] - o[0]) ** 2 + (c[1] - o[1]) ** 2 < (3 * radius) ** 2
               for o in centers):
            continue
        yy, xx = np.ogrid[:size[0], :size[1]]
        segm[(yy - c[0]) ** 2 + (xx - c[1]) ** 2 <= radius ** 2] = 1
        centers.append(c)
    img = np.stack([segm * 0.8 + 0.1] * 3, axis=-1).astype(np.float32)
    return img, segm, centers


PARAMS = dict(ctr.CENTER_PARAMS, slic_size=10, slic_regul=0.3,
              fts_hist_diams=[4, 8, 16], fts_ray_step=30,
              center_dist_thr=8, nb_classif_search=1)


def test_dbscan_clusters():
    pts = np.array([[0, 0], [1, 0], [0, 1], [50, 50], [51, 50], [200, 200]],
                   float)
    labels = dbscan(pts, eps=5, min_samples=1)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] != labels[0]
    assert labels[5] not in (labels[0], labels[3])
    # min_samples above cluster sizes -> noise
    labels2 = dbscan(pts, eps=5, min_samples=4)
    assert np.all(labels2 == -1)


def test_compute_points_features_shapes():
    rng = np.random.default_rng(0)
    _, segm, _ = _blob_scene(rng)
    points = np.array([[10, 10], [48, 64], [90, 120]])
    fts, names = ctr.compute_points_features(segm, points, PARAMS)
    assert fts.shape[0] == 3
    assert fts.shape[1] == len(names)
    # histogram block: 3 diameters x 2 labels; ray block: 360/30 angles
    assert sum(n.startswith('hist') for n in names) == 6
    assert sum(n.startswith('ray') for n in names) == 12


def test_label_close_points():
    points = np.array([[5, 5], [30, 30], [60, 60]])
    labels = ctr.label_close_points([(6, 6), (61, 59)], points,
                                    {'center_dist_thr': 5})
    assert labels.tolist() == [1, 0, 1]
    mask = np.zeros((70, 70), dtype=int)
    mask[30, 30] = 7
    labels2 = ctr.label_close_points(mask, points, {})
    assert labels2.tolist() == [0, 7, 0]


def test_cluster_center_candidates():
    pts = np.array([[10, 10], [12, 11], [11, 9], [50, 70], [52, 69]], float)
    centers, labels = ctr.cluster_center_candidates(pts, max_dist=10)
    assert len(centers) == 2
    assert np.allclose(sorted(centers[:, 0]), [11, 51], atol=1)


def test_end_to_end_detection():
    rng = np.random.default_rng(1)
    train = [_blob_scene(rng) for _ in range(3)]
    classif, _ = ctr.train_center_classifier(
        [s for _, s, _ in train], [i for i, _, _ in train],
        [c for _, _, c in train], PARAMS)
    img, segm, true_centers = _blob_scene(np.random.default_rng(7))
    out = ctr.load_compute_detect_centers(
        img, segm, classif, dict(PARAMS, DBSCAN_max_dist=15))
    stats = ctr.evaluate_detected_centers(out['centers'], true_centers,
                                          dist_thr=10)
    assert stats['recall'] >= 2 / 3
    assert stats['precision'] >= 0.5


def test_evaluate_detected_centers_edges():
    s = ctr.evaluate_detected_centers([], [(1, 1)], 5)
    assert s['FN'] == 1 and s['TP'] == 0
    s = ctr.evaluate_detected_centers([(1, 1)], [], 5)
    assert s['FP'] == 1
    s = ctr.evaluate_detected_centers([(1, 1), (50, 50)], [(2, 2)], 5)
    assert s == pytest.approx({'TP': 1, 'FP': 1, 'FN': 0, 'precision': 0.5,
                               'recall': 1.0, 'f1': 2 / 3}, abs=1e-6)
