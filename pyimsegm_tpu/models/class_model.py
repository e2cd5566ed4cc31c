"""Class-model pipeline: scaler -> PCA -> mixture model, as a jax pytree.

TPU-native counterpart of the sklearn ``Pipeline([scaler, PCA?, model])``
built by ``estim_class_model`` (`/root/reference/imsegm/graph_cuts.py:73-163`).
The whole predict path (standardise, rotate, mixture responsibilities) is
jittable and vmappable over batches of images.

Model option space mirrors the reference: 'GMM', 'GMM_kmeans', 'GMM_Otsu',
'kmeans', 'kmeans_quantiles', 'BGM', 'Otsu'.  Note the reference feeds its
clustering labels ``y`` into ``GaussianMixture.fit(X, y)``, which sklearn
silently ignores; we implement the documented *intent* (EM seeded from those
labels), which the reference's option names describe.

PCA keeps shapes static: the full rotation is always applied and components
beyond the requested explained-variance mass are masked to zero.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.models import gmm as gmm_mod
from pyimsegm_tpu.models import otsu as otsu_mod


class ClassModel(NamedTuple):
    """Fitted scaler+PCA+GMM pipeline (a pytree of device arrays)."""
    scaler_mean: Optional[jnp.ndarray]     # (D,) or None
    scaler_scale: Optional[jnp.ndarray]    # (D,) or None
    pca_components: Optional[jnp.ndarray]  # (D, D) rows = principal axes, or None
    pca_mean: Optional[jnp.ndarray]        # (D,)
    pca_mask: Optional[jnp.ndarray]        # (D,) 1.0 for kept components
    gmm: gmm_mod.GMMParams

    @property
    def n_classes(self):
        return self.gmm.weights.shape[0]

    def transform(self, features):
        x = jnp.asarray(features, jnp.float32)
        if self.scaler_mean is not None:
            x = (x - self.scaler_mean) / self.scaler_scale
        if self.pca_components is not None:
            # full-f32 matmul: keeps TPU and CPU projections aligned (see
            # models/gmm.full_precision)
            with jax.default_matmul_precision('highest'):
                x = (x - self.pca_mean) @ self.pca_components.T
            x = x * self.pca_mask
        return x

    def predict_proba(self, features):
        """(N, C) class responsibilities."""
        return gmm_mod.gmm_predict_proba(self.gmm, self.transform(features))

    def predict(self, features):
        return jnp.argmax(self.predict_proba(features), axis=-1).astype(jnp.int32)


def _fit_scaler(x, w):
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    var = jnp.sum(((x - mean) ** 2) * w[:, None], axis=0) / n
    return mean, jnp.sqrt(jnp.maximum(var, 1e-12))


@gmm_mod.full_precision
def _fit_pca(x, w, pca_coef):
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    xc = (x - mean) * jnp.sqrt(w)[:, None]
    cov = xc.T @ xc / n
    eigval, eigvec = jnp.linalg.eigh(cov)
    order = jnp.argsort(-eigval)
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    ratio = jnp.cumsum(eigval) / jnp.maximum(jnp.sum(eigval), 1e-30)
    # keep the minimal leading set explaining >= pca_coef variance
    keep = jnp.concatenate([jnp.ones(1), (ratio[:-1] < pca_coef).astype(jnp.float32)])
    return eigvec.T, mean, keep


def estim_class_model(features, nb_classes, estim_model='GMM', pca_coef=None,
                      use_scaler=True, max_iter=99, sample_weight=None, seed=0):
    """Fit the scaler+PCA+model pipeline (`graph_cuts.py:73-163`).

    :param features: (N, D) array-like
    :param sample_weight: optional (N,) weights (0 = padded slot)
    :returns: :class:`ClassModel`
    """
    x = jnp.asarray(features, jnp.float32)
    n, d = x.shape
    w = (jnp.ones((n,), jnp.float32) if sample_weight is None
         else jnp.asarray(sample_weight, jnp.float32))

    scaler_mean = scaler_scale = None
    if use_scaler:
        scaler_mean, scaler_scale = _fit_scaler(x, w)
        x = (x - scaler_mean) / scaler_scale
    pca_components = pca_mean = pca_mask = None
    if pca_coef is not None:
        pca_components, pca_mean, pca_mask = _fit_pca(x, w, float(pca_coef))
        x = ((x - pca_mean) @ pca_components.T) * pca_mask

    key = jax.random.PRNGKey(seed)
    n_init = max(1, int(np.sqrt(max_iter)))

    if '_' in estim_model:
        base, init_type = estim_model.split('_', 1)
    else:
        base, init_type = estim_model, ''

    if base == 'GMM' and not init_type:
        params = gmm_mod.gmm_fit(key, x, w, nb_classes, n_init=n_init, max_iter=max_iter)
    elif base == 'GMM' and init_type == 'kmeans':
        _, y = gmm_mod.kmeans_fit(key, x, w, nb_classes, n_iter=max_iter)
        params = gmm_mod.gmm_fit_from_labels(x, y, w, nb_classes, max_iter=max_iter)
    elif base == 'GMM' and init_type == 'Otsu':
        y = otsu_mod.compute_multivariate_otsu(x, w)
        params = gmm_mod.gmm_fit_from_labels(x, y, w, nb_classes, max_iter=max_iter)
    elif base == 'kmeans':
        if init_type == 'quantiles':
            centers = gmm_mod.quantile_init_centers(x, nb_classes)
            _, y = gmm_mod.kmeans_fit(key, x, w, nb_classes, n_iter=2, init_centers=centers)
        else:
            _, y = gmm_mod.kmeans_fit(key, x, w, nb_classes, n_iter=max_iter)
        params = gmm_mod.gmm_fit_from_labels(x, y, w, nb_classes, max_iter=1)
    elif base == 'BGM':
        # variational Bayesian GMM (CAVI, Dirichlet + Normal-Wishart priors),
        # exported as expected parameters — the true counterpart of sklearn
        # BayesianGaussianMixture (`graph_cuts.py:144-147`)
        from pyimsegm_tpu.models import bgm as bgm_mod
        params = bgm_mod.bgm_fit(key, x, w, nb_classes, n_init=n_init,
                                 max_iter=max_iter)
    elif base == 'Otsu':
        if nb_classes != 2:
            raise ValueError("estim_model='Otsu' supports exactly 2 classes")
        y = otsu_mod.compute_multivariate_otsu(x, w)
        params = gmm_mod.gmm_fit_from_labels(x, y, w, nb_classes, max_iter=1)
    else:
        raise ValueError('unknown estim_model: %r' % estim_model)

    return ClassModel(scaler_mean, scaler_scale, pca_components, pca_mean,
                      pca_mask, params)
