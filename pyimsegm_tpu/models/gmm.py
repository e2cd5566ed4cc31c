"""Batched Gaussian-mixture EM and k-means on device.

The reference clusters superpixel features with sklearn
``GaussianMixture(covariance_type='full', n_init=sqrt(max_iter))`` and
``KMeans`` (`/root/reference/imsegm/graph_cuts.py:107-163,221-285`).  Here EM
and Lloyd iterations are jitted `lax.fori_loop`s whose inner steps are
matmuls/cholesky factorisations batched over mixture components, and the
``n_init`` restarts run concurrently via ``jax.vmap`` over PRNG seeds — the
TPU replacement for sklearn's sequential restarts.

Samples can carry a weight/mask vector so statically padded (empty)
superpixel slots do not perturb the fit.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GMMParams(NamedTuple):
    weights: jnp.ndarray    # (C,)
    means: jnp.ndarray      # (C, D)
    covs: jnp.ndarray       # (C, D, D)


_LOG2PI = 1.8378770664093453


def full_precision(fn):
    """Trace the wrapped function with full-f32 matmul passes.

    The default TPU matmul precision multiplies in bf16; model fitting and
    inference matmuls are tiny (K x D x C scale) but their rounding shifts
    EM trajectories enough that TPU and CPU runs converge to visibly
    different mixtures (breaking the cross-backend ARS >= 0.98 acceptance,
    `tools/check_parity.py`).  Full precision here costs nothing at pipeline
    level — the pixel-scale convolutions stay at default precision."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision('highest'):
            return fn(*args, **kwargs)
    return wrapped


@full_precision
def _chol_log_prob(x, means, covs):
    """log N(x | mu_c, Sigma_c) for all components; (N, C)."""
    def per_comp(mu, cov):
        d = x.shape[-1]
        chol = jnp.linalg.cholesky(cov)
        diff = x - mu                                        # (N, D)
        z = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)  # (D, N)
        quad = jnp.sum(z * z, axis=0)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (d * _LOG2PI + logdet + quad)
    return jax.vmap(per_comp, in_axes=(0, 0), out_axes=1)(means, covs)


def gmm_log_resp(params: GMMParams, x):
    """(N, C) unnormalised log responsibilities."""
    lp = _chol_log_prob(x, params.means, params.covs)
    return lp + jnp.log(jnp.maximum(params.weights, 1e-30))


def gmm_predict_proba(params: GMMParams, x):
    lr = gmm_log_resp(params, x)
    return jax.nn.softmax(lr, axis=-1)


def gmm_score(params: GMMParams, x, sample_weight):
    """Weighted mean log-likelihood (model-selection criterion for restarts)."""
    ll = jax.scipy.special.logsumexp(gmm_log_resp(params, x), axis=-1)
    return jnp.sum(ll * sample_weight) / jnp.maximum(jnp.sum(sample_weight), 1.0)


@full_precision
def _m_step(x, resp, sample_weight, reg_covar):
    w = resp * sample_weight[:, None]                        # (N, C)
    nk = jnp.sum(w, axis=0) + 1e-10                          # (C,)
    means = (w.T @ x) / nk[:, None]                          # (C, D)

    def cov_c(wc, mu):
        diff = x - mu
        cov = (diff * wc[:, None]).T @ diff / jnp.sum(wc + 1e-10)
        return cov + reg_covar * jnp.eye(x.shape[-1], dtype=x.dtype)

    covs = jax.vmap(cov_c, in_axes=(1, 0))(w, means)
    weights = nk / jnp.sum(nk)
    return GMMParams(weights, means, covs)


# ---------------------------------------------------------------- k-means ---

@full_precision
def kmeans_plus_plus_init(key, x, sample_weight, n_clusters):
    """k-means++ seeding (sequential over C via scan; C is small)."""
    n = x.shape[0]
    logw = jnp.log(jnp.maximum(sample_weight, 1e-30))
    k0, key = jax.random.split(key)
    first = jax.random.categorical(k0, logw)
    centers0 = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(carry, i):
        centers, key = carry
        d2 = jnp.min(jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
                     + jnp.where(jnp.arange(n_clusters)[None] < i, 0.0, 1e30), axis=1)
        kk, key = jax.random.split(key)
        idx = jax.random.categorical(kk, jnp.log(jnp.maximum(d2, 1e-30)) + logw)
        centers = centers.at[i].set(x[idx])
        return (centers, key), None

    (centers, _), _ = jax.lax.scan(body, (centers0, key), jnp.arange(1, n_clusters))
    return centers


@full_precision
def kmeans_fit(key, x, sample_weight, n_clusters, n_iter=50, init_centers=None):
    """Lloyd iterations; returns (centers, labels)."""
    if init_centers is None:
        init_centers = kmeans_plus_plus_init(key, x, sample_weight, n_clusters)

    def assign(centers):
        d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=-1)

    def body(_, centers):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype) * sample_weight[:, None]
        cnt = jnp.sum(onehot, axis=0)
        new = (onehot.T @ x) / jnp.maximum(cnt, 1e-10)[:, None]
        return jnp.where((cnt > 0)[:, None], new, centers)

    centers = jax.lax.fori_loop(0, n_iter, body, init_centers)
    return centers, assign(centers)


def quantile_init_centers(x, n_clusters):
    """Reference 'quantiles' k-means init: per-dim percentiles linspace(5, 95)
    (`graph_cuts.py:275-278`)."""
    qs = jnp.linspace(5.0, 95.0, n_clusters)
    return jnp.percentile(x, qs, axis=0)


# -------------------------------------------------------------------- EM ---

def _em_fit_single(key, x, sample_weight, n_components, max_iter, reg_covar,
                   init_resp=None, tol=1e-3):
    if init_resp is None:
        _, labels = kmeans_fit(key, x, sample_weight, n_components, n_iter=15)
        init_resp = jax.nn.one_hot(labels, n_components, dtype=x.dtype)
    params = _m_step(x, init_resp, sample_weight, reg_covar)

    # EM with sklearn-style early stopping on the mean log-likelihood change
    # (`GaussianMixture(tol=1e-3)`); while_loop keeps iterations data-dependent
    # without dynamic shapes
    def cond(state):
        _, prev_ll, ll, it = state
        return (it < max_iter) & (jnp.abs(ll - prev_ll) > tol)

    def body(state):
        params, _, ll, it = state
        lr = gmm_log_resp(params, x)
        resp = jax.nn.softmax(lr, axis=-1)
        new_ll = jnp.sum(jax.scipy.special.logsumexp(lr, axis=-1) * sample_weight) \
            / jnp.maximum(jnp.sum(sample_weight), 1.0)
        return (_m_step(x, resp, sample_weight, reg_covar), ll, new_ll, it + 1)

    params, _, _, _ = jax.lax.while_loop(
        cond, body, (params, jnp.float32(-jnp.inf), jnp.float32(jnp.inf), 0))
    return params, gmm_score(params, x, sample_weight)


@functools.partial(jax.jit, static_argnames=('n_components', 'n_init', 'max_iter'))
def gmm_fit(key, x, sample_weight, n_components, n_init=1, max_iter=99,
            reg_covar=1e-6):
    """Fit a full-covariance GMM with vmapped random restarts.

    :param x: (N, D) float32 features
    :param sample_weight: (N,) float32; 0 disables padded samples
    :returns: best GMMParams by weighted log-likelihood
    """
    x = x.astype(jnp.float32)
    keys = jax.random.split(key, n_init)
    fit = functools.partial(_em_fit_single, x=x, sample_weight=sample_weight,
                            n_components=n_components, max_iter=max_iter,
                            reg_covar=reg_covar)
    params, scores = jax.vmap(lambda k: fit(k))(keys)
    # a restart whose EM diverged (collapsed component -> non-PSD covariance
    # -> NaN trajectory) must lose the restart selection, but NaN wins a
    # plain argmax under IEEE compare semantics and would poison the fit
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    best = jnp.argmax(scores)
    return jax.tree_util.tree_map(lambda a: a[best], params)


@functools.partial(jax.jit, static_argnames=('n_components', 'max_iter'))
def gmm_fit_from_labels(x, labels, sample_weight, n_components, max_iter=1,
                        reg_covar=1e-6):
    """Fit starting from hard init labels (reference 'GMM_kmeans'/'GMM_Otsu'/
    'kmeans' modes seed EM with clustering labels, `graph_cuts.py:124-151`)."""
    x = x.astype(jnp.float32)
    resp = jax.nn.one_hot(labels, n_components, dtype=x.dtype)
    params, _ = _em_fit_single(jax.random.PRNGKey(0), x, sample_weight,
                               n_components, max_iter, reg_covar, init_resp=resp)
    return params
