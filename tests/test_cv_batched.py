"""Fold-batched CV scoring: all folds in one vmapped device program."""

import numpy as np
import pytest

from pyimsegm_tpu import classification as clf_mod


def _data(n=240, seed=0):
    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.normal(-1.5, 0.6, (n // 2, 4)),
                        rng.normal(1.5, 0.6, (n // 2, 4))]).astype(np.float32)
    y = np.repeat([0, 1], n // 2)
    perm = rng.permutation(n)
    return x[perm], y[perm]


@pytest.mark.parametrize('name', ['RandForest', 'GradBoost', 'LogistRegr'])
def test_fold_batched_scores_match_host_loop(name):
    """The vmapped path must score each fold like the sequential path does
    (same folds, same seed; small tolerance for the scaler epsilon and
    reduction-order differences under vmap)."""
    x, y = _data()
    folds = list(clf_mod.CrossValidate(len(y), 60, rand_seed=0))
    batched = clf_mod._eval_cv_scores_fold_batched(name, x, y, folds, 0, {})

    loop = []
    for train_idx, test_idx in folds:
        c = clf_mod.Classifier(name, seed=0)
        c.fit(x[train_idx], y[train_idx])
        loop.append(c.score(x[test_idx], y[test_idx]))

    assert len(batched) == len(folds)
    # on this separable data both paths should be essentially perfect
    assert min(batched) > 0.95
    np.testing.assert_allclose(batched, loop, atol=0.05)


def test_eval_cross_val_dispatches_to_batched(monkeypatch):
    x, y = _data(120)
    called = {}
    orig = clf_mod._eval_cv_scores_fold_batched

    def spy(*a, **k):
        called['hit'] = True
        return orig(*a, **k)

    monkeypatch.setattr(clf_mod, '_eval_cv_scores_fold_batched', spy)
    scores = clf_mod.eval_classif_cross_val_scores('RandForest', x, y,
                                                   cross_val=4)
    assert called.get('hit')
    assert len(scores) == 4


def test_eval_cross_val_pca_falls_back_to_loop(monkeypatch):
    x, y = _data(120)

    def boom(*a, **k):
        raise AssertionError('batched path must not run with PCA')

    monkeypatch.setattr(clf_mod, '_eval_cv_scores_fold_batched', boom)
    scores = clf_mod.eval_classif_cross_val_scores('RandForest', x, y,
                                                   cross_val=4, pca_coef=0.95)
    assert len(scores) == 4


def test_classif_search_uses_batched_scoring():
    x, y = _data(160)
    search = clf_mod.ClassifSearch('LogistRegr', cross_val=4, nb_iter=3)
    search.fit(x, y)
    assert search.best_score_ > 0.9
    assert search.best_estimator_.score(x, y) > 0.9
