"""True-boosting models: histogram GBT and SAMME.R AdaBoost.

Replaces the round-1 forest-variant stand-ins
(`/root/reference/imsegm/classification.py:95-117`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu.classification import Classifier
from pyimsegm_tpu.models import adaboost as ada_mod
from pyimsegm_tpu.models import gbt as gbt_mod


def _blobs(n_per=150, seed=0):
    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.normal(-2, 0.5, (n_per, 2)),
                        rng.normal(0, 0.5, (n_per, 2)),
                        rng.normal(2, 0.5, (n_per, 2))]).astype(np.float32)
    y = np.repeat([0, 1, 2], n_per).astype(np.int32)
    return x, y


def _spiral(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 3, n)
    c = rng.integers(0, 3, n)
    x = np.stack([np.cos(t * 2 + c * 2.1) * t + rng.normal(0, .15, n),
                  np.sin(t * 2 + c * 2.1) * t + rng.normal(0, .15, n),
                  rng.normal(0, 1, n)], axis=1).astype(np.float32)
    return x, c.astype(np.int32)


def test_gbt_separable_blobs_near_perfect():
    x, y = _blobs()
    p = gbt_mod.gbt_fit(jnp.asarray(x), jnp.asarray(y),
                        jnp.ones(len(x)), 3, n_rounds=16, depth=3)
    proba = np.asarray(gbt_mod.gbt_predict_proba(p, jnp.asarray(x)))
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    assert np.mean(proba.argmax(1) == y) > 0.99


def test_gbt_root_split_matches_exact_histogram_gain():
    """First-round root split must equal the numpy-exact argmax over the
    (feature, bin) gain surface — pins the segment-sum histogram layout."""
    x, y = _blobs(seed=3)
    n = len(x)
    w = jnp.ones(n)
    n_bins = 64
    edges = gbt_mod._quantile_bin_edges(jnp.asarray(x), w, n_bins)
    bins = np.asarray(gbt_mod._bin_features(jnp.asarray(x), edges))
    # round-0 gradients for class 0 at the uniform prior
    onehot = np.eye(3)[y]
    p0 = np.full((n, 3), 1 / 3)
    g = (p0 - onehot)[:, 0].astype(np.float32)
    h = (p0 * (1 - p0))[:, 0].astype(np.float32)

    best = (-np.inf, None, None)
    for f in range(x.shape[1]):
        gh = np.zeros(n_bins)
        hh = np.zeros(n_bins)
        np.add.at(gh, bins[:, f], g)
        np.add.at(hh, bins[:, f], h)
        gl, hl = np.cumsum(gh), np.cumsum(hh)
        gt, ht = gl[-1], hl[-1]
        gain = (gl ** 2 / (hl + 1.0) + (gt - gl) ** 2 / (ht - hl + 1.0)
                - gt ** 2 / (ht + 1.0))
        gain[-1] = -np.inf
        b = int(np.argmax(gain))
        if gain[b] > best[0]:
            best = (gain[b], f, b)

    edges_full = jnp.concatenate(
        [edges, jnp.full((x.shape[1], 1), 3.4e38)], axis=1)
    feat, thr, _leaf = gbt_mod._fit_level_trees(
        jnp.asarray(bins), jnp.asarray(g), jnp.asarray(h), n_bins, 1, 1.0,
        edges_full)
    assert int(feat[0]) == best[1]
    assert float(thr[0]) == pytest.approx(float(edges[best[1], best[2]]))


def test_gbt_beats_prior_on_nonlinear_data():
    x, y = _spiral()
    xtr, xte, ytr, yte = x[:800], x[800:], y[:800], y[800:]
    clf = Classifier('GradBoost').fit(xtr, ytr)
    assert clf.score(xte, yte) > 0.85


def test_gbt_ignores_masked_samples():
    x, y = _blobs()
    # poison half the samples with swapped labels but zero weight
    y_bad = y.copy()
    y_bad[::2] = (y[::2] + 1) % 3
    w = np.ones(len(x), np.float32)
    w[::2] = 0.0
    p = gbt_mod.gbt_fit(jnp.asarray(x), jnp.asarray(y_bad),
                        jnp.asarray(w), 3, n_rounds=16, depth=3)
    proba = np.asarray(gbt_mod.gbt_predict_proba(p, jnp.asarray(x[1::2])))
    assert np.mean(proba.argmax(1) == y[1::2]) > 0.99


def test_adaboost_separable_blobs():
    x, y = _blobs()
    p = ada_mod.adaboost_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(y), jnp.ones(len(x)), 3,
                             n_rounds=8, depth=2)
    proba = np.asarray(ada_mod.adaboost_predict_proba(p, jnp.asarray(x)))
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    assert np.mean(proba.argmax(1) == y) > 0.99


@pytest.mark.slow
def test_adaboost_boosting_actually_reweights():
    """Later rounds must differ from round 0 (the stand-in this replaces
    trained every member on identical weights)."""
    x, y = _spiral(600)
    p = ada_mod.adaboost_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(y), jnp.ones(len(x)), 3,
                             n_rounds=6, depth=3)
    thr = np.asarray(p.thr)
    assert not np.allclose(thr[0], thr[-1])


@pytest.mark.slow
def test_boosting_classifier_roundtrip(tmp_path):
    from pyimsegm_tpu.classification import load_classifier, save_classifier
    x, y = _blobs(60)
    for name in ('GradBoost', 'AdaBoost'):
        clf = Classifier(name, n_rounds=8, depth=2).fit(x, y)
        path = save_classifier(str(tmp_path), clf, name)
        clf2 = load_classifier(path)
        np.testing.assert_allclose(clf.predict_proba(x[:10]),
                                   clf2.predict_proba(x[:10]), atol=1e-6)
