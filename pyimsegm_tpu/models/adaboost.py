"""AdaBoost (SAMME.R) over device-trained trees.

True boosting replacement for the reference's sklearn ``AdaBoostClassifier``
(`/root/reference/imsegm/classification.py:95-117`) — round-1 review flagged
the previous uniform-forest stand-in.

Each round fits one tree with the *current* sample weights using the same
level-synchronous tree builder as :mod:`pyimsegm_tpu.models.forest` (the fit
is jitted with static shapes, so the sequential rounds are cache-hit
dispatches, not recompiles), then reweights samples by the SAMME.R
exponential update
``w_i *= exp(-(C-1)/C * y_i . log p(x_i))``.
Prediction sums the per-tree SAMME.R decision scores
``(C-1) (log p_k - mean_j log p_j)`` across rounds.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyimsegm_tpu.models import forest as forest_mod


class AdaBoostParams(NamedTuple):
    feat: jnp.ndarray    # (R, n_internal) int32
    thr: jnp.ndarray     # (R, n_internal) float32
    leaf_proba: jnp.ndarray  # (R, n_leaves, C)
    depth: int

    @property
    def n_classes(self):
        return self.leaf_proba.shape[-1]


_EPS = 1e-7


def adaboost_fit(key, x, y, sample_weight, n_classes, n_rounds=24, depth=3,
                 n_candidates=16):
    """Fit SAMME.R AdaBoost.

    :param x: (N, F) float32
    :param y: (N,) int32
    :param sample_weight: (N,) float32, 0 = padded slot
    :returns: :class:`AdaBoostParams`
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    w = jnp.asarray(sample_weight, jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)
    # SAMME.R codes the labels as y_k = 1 if k==c else -1/(C-1)
    y_code = jnp.where(onehot > 0, 1.0, -1.0 / max(n_classes - 1, 1))

    feats, thrs, leaves = [], [], []
    for r in range(n_rounds):
        key, sub = jax.random.split(key)
        params = forest_mod.forest_fit(sub, x, y, w, n_classes, n_trees=1,
                                       depth=depth, n_candidates=n_candidates,
                                       bootstrap=False)
        proba = forest_mod.forest_predict_proba(params, x)      # (N, C)
        logp = jnp.log(jnp.clip(proba, _EPS, 1.0))
        # weight update; padded slots stay 0 because w started at 0 there
        upd = jnp.exp(-(n_classes - 1.0) / n_classes
                      * jnp.sum(y_code * logp, axis=1))
        w = w * upd
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        feats.append(params.feat[0])
        thrs.append(params.thr[0])
        leaves.append(params.leaf_proba[0])

    return AdaBoostParams(jnp.stack(feats), jnp.stack(thrs),
                          jnp.stack(leaves), depth)


def adaboost_predict_proba(params: AdaBoostParams, x):
    """(N, C) softmax over summed SAMME.R decision scores."""
    x = jnp.asarray(x, jnp.float32)
    probs = forest_mod._forest_predict_jit(   # per-"tree" walk, R as tree axis
        params.feat, params.thr, params.leaf_proba, int(params.depth), x,
        reduce_mean=False)                                      # (R, N, C)
    logp = jnp.log(jnp.clip(probs, _EPS, 1.0))
    scores = logp - jnp.mean(logp, axis=-1, keepdims=True)
    return jax.nn.softmax(jnp.sum(scores, axis=0), axis=-1)
