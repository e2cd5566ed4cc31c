"""Multi-object morphological ACWE (`pyimsegm_tpu.ops.snakes`)."""

import numpy as np

from pyimsegm_tpu.ops import snakes
from pyimsegm_tpu.utils.metrics import adjusted_rand_score


def _two_disc_scene():
    rng = np.random.default_rng(0)
    img = np.full((80, 120), 0.1) + rng.normal(0, 0.02, (80, 120))
    yy, xx = np.mgrid[:80, :120]
    obj1 = ((yy - 40) ** 2 + (xx - 30) ** 2) <= 18 ** 2
    obj2 = ((yy - 40) ** 2 + (xx - 85) ** 2) <= 15 ** 2
    img[obj1], img[obj2] = 0.9, 0.85
    return img, obj1, obj2


def test_acwe_two_objects_grow_from_seeds():
    img, obj1, obj2 = _two_disc_scene()
    masks = snakes.circle_masks(img.shape, [(40, 30), (40, 85)], radius=6)
    lab = np.asarray(snakes.morph_acwe_multi(img, masks, n_iter=80))
    gt = obj1.astype(int) + 2 * obj2.astype(int)
    assert adjusted_rand_score(lab, gt) > 0.9
    for lb, obj in ((1, obj1), (2, obj2)):
        iou = (np.logical_and(lab == lb, obj).sum()
               / np.logical_or(lab == lb, obj).sum())
        assert iou > 0.9
    # objects stay disjoint
    assert np.logical_and(lab == 1, lab == 2).sum() == 0


def test_acwe_shrinks_oversized_init():
    img, obj1, _ = _two_disc_scene()
    img[:, 60:] = 0.1   # remove second object
    masks = snakes.circle_masks(img.shape, [(40, 30)], radius=30)
    lab = np.asarray(snakes.morph_acwe_multi(img, masks, n_iter=80))
    iou = (np.logical_and(lab == 1, obj1).sum()
           / np.logical_or(lab == 1, obj1).sum())
    assert iou > 0.85


def test_app_segment_morphsnakes_entry():
    from apps.run_ovary_egg_segmentation import (
        segment_morphsnakes,
        simplify_segm_3cls,
    )
    img, obj1, obj2 = _two_disc_scene()
    lab = segment_morphsnakes(img, [(40, 30), (40, 85)], smoothing=1,
                              lambdas=(1, 1), max_iter=80)
    assert lab.shape == img.shape and set(np.unique(lab)) <= {0, 1, 2}
    seg = (obj1.astype(int) + 2 * obj2.astype(int))
    simple = simplify_segm_3cls(seg)
    assert simple.shape == seg.shape and simple.max() <= 1.0
