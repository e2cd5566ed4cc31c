"""Classifier zoo extras: binary metrics, per-image stats, feature scoring,
ROC/AUC (mirroring `/root/reference/tests/test_classification.py` coverage).
"""

import numpy as np
import pytest

from pyimsegm_tpu import classification as clf_mod


def test_compute_tp_tn_fp_fn():
    rng = np.random.RandomState(0)
    annot = rng.randint(0, 2, (5, 7)) * 9
    segm = rng.randint(0, 2, (5, 7)) * 9
    assert clf_mod.compute_tp_tn_fp_fn(annot, annot) == (20, 15, 0, 0)
    assert clf_mod.compute_tp_tn_fp_fn(annot, segm) == (9, 5, 11, 10)
    out = clf_mod.compute_tp_tn_fp_fn(annot, np.ones((5, 7)))
    assert all(np.isnan(v) for v in out)
    assert clf_mod.compute_tp_tn_fp_fn(np.zeros((5, 7)), np.zeros((5, 7))) \
        == (35, 0, 0, 0)


def test_binary_ratio_metrics():
    rng = np.random.RandomState(0)
    annot = rng.randint(0, 2, (50, 75)) * 3
    segm = rng.randint(0, 2, (50, 75)) * 3
    assert clf_mod.compute_metric_fpfn_tpfn(annot, annot) == 0.0
    assert clf_mod.compute_metric_fpfn_tpfn(annot, segm) == \
        pytest.approx(1.02, abs=0.05)
    assert clf_mod.compute_metric_tpfp_tpfn(annot, annot) == 1.0
    assert np.isnan(clf_mod.compute_metric_fpfn_tpfn(annot, np.ones((50, 75))))


def test_compute_stat_per_image():
    rng = np.random.RandomState(0)
    img_true = rng.randint(0, 3, (50, 100))
    df = clf_mod.compute_stat_per_image([img_true], [img_true])
    assert df.iloc[0]['ARS'] == 1.0
    assert df.iloc[0]['accuracy'] == 1.0


@pytest.mark.slow
def test_feature_scoring_selection():
    rng = np.random.RandomState(0)
    n = 300
    labels = rng.randint(0, 2, n)
    informative = labels * 2.0 + rng.normal(0, 0.3, n)
    noise = rng.normal(0, 1.0, (n, 3))
    features = np.column_stack([noise[:, 0], informative, noise[:, 1:]])
    indices, df = clf_mod.feature_scoring_selection(features, labels)
    assert df.shape == (4, 4)
    # informative feature (index 1) ranked top by F-test and the forest
    assert df['F-test'].values.argmax() == 1
    assert indices[0] == 1


def test_eval_classif_cross_val_roc():
    rng = np.random.RandomState(0)
    labels = np.array([0] * 60 + [1] * 60)
    data = labels[:, None] * 2.0 + rng.normal(0, 0.5, (120, 4))
    df, auc = clf_mod.eval_classif_cross_val_roc('LogistRegr', data, labels,
                                                 cross_val=4, nb_steps=21)
    assert list(df.columns) == ['FP', 'TP']
    assert len(df) == 21
    assert auc > 0.9
    assert df['TP'].iloc[0] == 0.0
    assert df['TP'].iloc[-1] == pytest.approx(1.0, abs=1e-6)


def test_eval_classif_cross_val_scores():
    rng = np.random.RandomState(1)
    labels = np.array([0] * 60 + [1] * 60)
    data = labels[:, None] * 2.0 + rng.normal(0, 0.5, (120, 4))
    scores = clf_mod.eval_classif_cross_val_scores('LogistRegr', data, labels,
                                                   cross_val=4)
    assert len(scores) == 4
    assert np.mean(scores) > 0.9
