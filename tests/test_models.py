"""Model tests: GMM-EM, k-means, Otsu — vs sklearn on separable data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu.models import gmm as gmm_mod
from pyimsegm_tpu.models import otsu as otsu_mod
from pyimsegm_tpu.models.class_model import estim_class_model
from pyimsegm_tpu.utils.metrics import adjusted_rand_score


def _two_blobs(n=60, d=3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((n, d)) - 1.0
    b = rng.random((n, d)) + 1.0
    x = np.vstack([a, b]).astype(np.float32)
    y = np.array([0] * n + [1] * n)
    return x, y


def test_gmm_fit_separates_blobs():
    x, y = _two_blobs()
    params = gmm_mod.gmm_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.ones(len(x)), 2, n_init=3, max_iter=50)
    proba = np.asarray(gmm_mod.gmm_predict_proba(params, jnp.asarray(x)))
    assert proba.shape == (len(x), 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    assert adjusted_rand_score(proba.argmax(1), y) == pytest.approx(1.0)


def test_gmm_matches_sklearn_loglik():
    from sklearn.mixture import GaussianMixture
    x, _ = _two_blobs(seed=1)
    params = gmm_mod.gmm_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.ones(len(x)), 2, n_init=3, max_iter=80)
    ours = float(gmm_mod.gmm_score(params, jnp.asarray(x), jnp.ones(len(x))))
    sk = GaussianMixture(2, covariance_type='full', n_init=3,
                         random_state=0).fit(x).score(x)
    assert ours == pytest.approx(sk, abs=0.05)


def test_gmm_ignores_masked_samples():
    x, y = _two_blobs(seed=2)
    # append garbage rows with zero weight
    x_pad = np.vstack([x, np.full((20, 3), 1e3, np.float32)])
    w = np.concatenate([np.ones(len(x)), np.zeros(20)]).astype(np.float32)
    params = gmm_mod.gmm_fit(jax.random.PRNGKey(0), jnp.asarray(x_pad),
                             jnp.asarray(w), 2, n_init=2, max_iter=40)
    assert np.abs(np.asarray(params.means)).max() < 10


def test_kmeans_plus_plus():
    x, y = _two_blobs(seed=3)
    centers, labels = gmm_mod.kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x),
                                         jnp.ones(len(x)), 2)
    assert adjusted_rand_score(np.asarray(labels), y) == pytest.approx(1.0)


def test_otsu_threshold_matches_sklearn_like():
    rng = np.random.default_rng(4)
    vals = np.concatenate([rng.normal(0, 0.5, 300), rng.normal(5, 0.5, 300)])
    thr = float(otsu_mod.threshold_otsu(jnp.asarray(vals, jnp.float32)))
    # Otsu lands on the inter-mode gap; argmax takes the first index of the
    # between-class-variance plateau (same tie-break as skimage)
    assert 1.2 < thr < 3.8


def test_multivariate_otsu_reference_doctest():
    rng = np.random.RandomState(0)
    fts = np.vstack([rng.random_sample((5, 3)) - 1, rng.random_sample((5, 3)) + 1])
    fts[:, 1] = -fts[:, 1]
    y = np.asarray(otsu_mod.compute_multivariate_otsu(jnp.asarray(fts, jnp.float32)))
    # golden from graph_cuts.py:174-179
    np.testing.assert_array_equal(y, [0, 0, 0, 0, 0, 1, 1, 1, 1, 1])


@pytest.mark.parametrize('estim_model', ['GMM', 'GMM_kmeans', 'GMM_Otsu',
                                         'kmeans', 'kmeans_quantiles', 'BGM', 'Otsu'])
def test_estim_class_model_variants(estim_model):
    x, y = _two_blobs(seed=5)
    model = estim_class_model(x, 2, estim_model=estim_model, max_iter=20)
    proba = np.asarray(model.predict_proba(x))
    assert proba.shape == (len(x), 2)
    assert adjusted_rand_score(proba.argmax(1), y) > 0.9


def test_estim_class_model_pca():
    x, y = _two_blobs(seed=6)
    model = estim_class_model(x, 2, pca_coef=0.95, max_iter=20)
    proba = np.asarray(model.predict_proba(x))
    assert adjusted_rand_score(proba.argmax(1), y) > 0.9


def test_gmm_fit_discards_nan_restart(monkeypatch):
    """A restart whose EM trajectory diverges to NaN must lose the restart
    selection instead of poisoning the argmax (IEEE NaN wins plain argmax);
    observed in the unsupervised pipeline where 1 of 9 restarts collapsed."""
    x, y = _two_blobs()
    w = jnp.ones(len(x))
    real = gmm_mod._em_fit_single
    bad_key = jax.random.split(jax.random.PRNGKey(0), 3)[1]

    def flaky(key, **kw):
        params, score = real(key, **kw)
        bad = jnp.all(key == bad_key)
        poison = lambda a: jnp.where(bad, jnp.nan, a)
        return jax.tree_util.tree_map(poison, params), poison(score)

    monkeypatch.setattr(gmm_mod, '_em_fit_single', flaky)
    jax.clear_caches()
    try:
        params = gmm_mod.gmm_fit(jax.random.PRNGKey(0), jnp.asarray(x), w, 2,
                                 n_init=3, max_iter=50)
    finally:
        jax.clear_caches()
    assert not any(bool(jnp.isnan(a).any()) for a in params)
    proba = np.asarray(gmm_mod.gmm_predict_proba(params, jnp.asarray(x)))
    assert adjusted_rand_score(proba.argmax(1), y) == pytest.approx(1.0)
