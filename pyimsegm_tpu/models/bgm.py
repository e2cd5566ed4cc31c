"""Variational Bayesian Gaussian mixture (CAVI), fitted on device.

True replacement for the reference's sklearn ``BayesianGaussianMixture``
(`/root/reference/imsegm/graph_cuts.py:144-147`) — round-1 review flagged
the previous strongly-regularised-GMM stand-in.

Conjugate mean-field model (Bishop PRML §10.2): Dirichlet prior on the
mixing weights, Normal-Wishart prior on each component's (mean, precision).
Every CAVI update is a closed-form expression of soft-count statistics —
matmuls, cholesky factorisations and digammas batched over components — so
the whole fit is one jitted ``lax.fori_loop``; restarts run concurrently
under ``vmap`` exactly like :func:`pyimsegm_tpu.models.gmm.gmm_fit`.

The fitted posterior is exported as expected-parameter
:class:`~pyimsegm_tpu.models.gmm.GMMParams`
(``weights = E[pi]``, ``means = m_k``, ``covs = E[Sigma_k]``), which keeps
the downstream jitted predict/GC paths unchanged; the Bayesian character
lives in the fit (empty components shrink to the prior instead of
degenerating — the behaviour the reference relies on BGM for).
"""

import functools

import jax
import jax.numpy as jnp

from pyimsegm_tpu.models.gmm import (
    GMMParams,
    full_precision,
    gmm_score,
    kmeans_plus_plus_init,
)

_LOG2 = 0.6931471805599453
_LOG2PI = 1.8378770664093453


@full_precision
def _cavi_fit_single(key, x, w, n_classes, max_iter, alpha0, beta0,
                     reg_covar, diag=False):
    """One CAVI run from a k-means++-seeded responsibility matrix.

    With ``diag=True`` the Wishart scale is diagonalised every m-step (the
    mean-field counterpart of sklearn's ``covariance_type='diag'``)."""
    n, d = x.shape
    eye = jnp.eye(d)
    nu0 = jnp.float32(d)
    # prior mean/scale from the (weighted) data
    n_eff = jnp.maximum(jnp.sum(w), 1.0)
    m0 = jnp.sum(x * w[:, None], axis=0) / n_eff
    xc = (x - m0) * jnp.sqrt(w)[:, None]
    data_cov = xc.T @ xc / n_eff + reg_covar * jnp.eye(d)
    if diag:
        data_cov = data_cov * eye
    # E[Lambda] under the prior = nu0 * W0 = inv(data_cov)  (sklearn's
    # covariance_prior default is the empirical covariance)
    w0_inv = data_cov * nu0

    centers = kmeans_plus_plus_init(key, x, w, n_classes)
    d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
    resp = jax.nn.one_hot(jnp.argmin(d2, axis=1), n_classes) * w[:, None]

    def m_step(resp):
        nk = jnp.sum(resp, axis=0) + 1e-10                     # (C,)
        xbar = (resp.T @ x) / nk[:, None]                      # (C, D)

        def sk(rc, mu):
            diff = x - mu
            return (diff * rc[:, None]).T @ diff / jnp.maximum(rc.sum(), 1e-10)

        s = jax.vmap(sk, in_axes=(1, 0))(resp, xbar)           # (C, D, D)
        alpha = alpha0 + nk
        beta = beta0 + nk
        m = (beta0 * m0[None] + nk[:, None] * xbar) / beta[:, None]
        dm = xbar - m0[None]
        winv = (w0_inv[None] + nk[:, None, None] * s
                + (beta0 * nk / beta)[:, None, None]
                * dm[:, :, None] * dm[:, None, :])
        if diag:
            winv = winv * eye[None]
        nu = nu0 + nk
        return alpha, beta, m, winv, nu

    def e_step(alpha, beta, m, winv, nu):
        # E[log pi], E[log |Lambda|], E[(x-mu)^T Lambda (x-mu)]
        e_logpi = jax.scipy.special.digamma(alpha) \
            - jax.scipy.special.digamma(jnp.sum(alpha))
        i = jnp.arange(1, d + 1, dtype=jnp.float32)

        def per_comp(winv_c, nu_c, m_c, beta_c):
            chol = jnp.linalg.cholesky(winv_c)
            logdet_winv = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
            e_logdet = (jnp.sum(jax.scipy.special.digamma(
                (nu_c + 1.0 - i) / 2.0)) + d * _LOG2 - logdet_winv)
            diff = x - m_c                                     # (N, D)
            z = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
            quad = nu_c * jnp.sum(z * z, axis=0) + d / beta_c
            return 0.5 * (e_logdet - quad)                     # (N,)

        logp = jax.vmap(per_comp, out_axes=1)(winv, nu, m, beta)
        logr = logp + e_logpi[None] - 0.5 * d * _LOG2PI
        return jax.nn.softmax(logr, axis=-1) * w[:, None]

    def body(_it, resp):
        return e_step(*m_step(resp))

    resp = jax.lax.fori_loop(0, max_iter, body, resp)
    alpha, beta, m, winv, nu = m_step(resp)
    # expected parameters: E[pi] and E[Sigma] = W^-1 / (nu - D - 1)
    weights = alpha / jnp.sum(alpha)
    denom = jnp.maximum(nu - d - 1.0, 1.0)
    covs = winv / denom[:, None, None] \
        + reg_covar * jnp.eye(d)[None]
    return GMMParams(weights, m, covs)


@functools.partial(jax.jit,
                   static_argnames=('n_classes', 'n_init', 'max_iter',
                                    'diag'))
def bgm_fit(key, x, sample_weight, n_classes, n_init=4, max_iter=99,
            alpha0=None, beta0=1.0, reg_covar=1e-6, diag=False):
    """Fit the variational Bayesian GMM; restarts vmapped, best by score.

    :param x: (N, D) float32
    :param sample_weight: (N,) float32, 0 = padded slot
    :returns: expected-parameter :class:`GMMParams`
    """
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(sample_weight, jnp.float32)
    if alpha0 is None:
        alpha0 = 1.0 / n_classes                   # sklearn's default
    keys = jax.random.split(key, n_init)
    params = jax.vmap(lambda k: _cavi_fit_single(
        k, x, w, n_classes, max_iter, jnp.float32(alpha0),
        jnp.float32(beta0), jnp.float32(reg_covar), diag=diag))(keys)
    scores = jax.vmap(lambda p: gmm_score(p, x, w))(params)
    # NaN-robust restart selection (matches gmm_fit)
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    best = jnp.argmax(scores)
    return jax.tree.map(lambda a: a[best], params)
