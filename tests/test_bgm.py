"""Variational Bayesian GMM (CAVI) — replaces the regularised-GMM stand-in
for the reference's sklearn BayesianGaussianMixture
(`/root/reference/imsegm/graph_cuts.py:144-147`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu.models import bgm as bgm_mod
from pyimsegm_tpu.models import gmm as gmm_mod
from pyimsegm_tpu.models.class_model import estim_class_model
from pyimsegm_tpu.utils.metrics import adjusted_rand_score


def _blobs(n=80, d=3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(-1.5, 0.4, (n, d))
    b = rng.normal(1.5, 0.4, (n, d))
    x = np.vstack([a, b]).astype(np.float32)
    y = np.array([0] * n + [1] * n)
    return x, y


def test_bgm_separates_blobs():
    x, y = _blobs()
    params = bgm_mod.bgm_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.ones(len(x)), 2, n_init=3, max_iter=50)
    proba = np.asarray(gmm_mod.gmm_predict_proba(params, jnp.asarray(x)))
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    assert adjusted_rand_score(proba.argmax(1), y) == pytest.approx(1.0)


def test_bgm_posterior_shrinks_toward_prior_weights():
    """With n_components > true clusters, the Dirichlet posterior must give
    surplus components near-zero expected weight (the property the
    reference uses BGM for; a plain GMM splits clusters instead)."""
    x, _ = _blobs(n=120)
    params = bgm_mod.bgm_fit(jax.random.PRNGKey(1), jnp.asarray(x),
                             jnp.ones(len(x)), 4, n_init=4, max_iter=120)
    w = np.sort(np.asarray(params.weights))
    assert w[-2:].sum() > 0.90          # two real clusters dominate
    assert w[0] < 0.05                  # surplus component emptied


def test_bgm_covariances_are_spd():
    x, _ = _blobs()
    params = bgm_mod.bgm_fit(jax.random.PRNGKey(2), jnp.asarray(x),
                             jnp.ones(len(x)), 3, n_init=2, max_iter=30)
    covs = np.asarray(params.covs)
    for c in covs:
        np.testing.assert_allclose(c, c.T, atol=1e-5)
        assert np.all(np.linalg.eigvalsh(c) > 0)


def test_bgm_ignores_masked_samples():
    x, y = _blobs()
    # adversarial far-away points with zero weight must not move the fit
    x_pad = np.vstack([x, np.full((30, x.shape[1]), 50.0, np.float32)])
    w = np.concatenate([np.ones(len(x)), np.zeros(30)]).astype(np.float32)
    params = bgm_mod.bgm_fit(jax.random.PRNGKey(0), jnp.asarray(x_pad),
                             jnp.asarray(w), 2, n_init=3, max_iter=50)
    assert float(np.abs(np.asarray(params.means)).max()) < 5.0
    proba = np.asarray(gmm_mod.gmm_predict_proba(params, jnp.asarray(x)))
    assert adjusted_rand_score(proba.argmax(1), y) == pytest.approx(1.0)


def test_estim_class_model_bgm_path():
    x, y = _blobs()
    model = estim_class_model(x, 2, estim_model='BGM', max_iter=25)
    proba = np.asarray(model.predict_proba(x))
    assert proba.shape == (len(x), 2)
    assert adjusted_rand_score(proba.argmax(1), y) == pytest.approx(1.0)
