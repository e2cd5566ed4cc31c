"""Linear / neural classifiers on device: logistic regression, MLP, linear
SVM (probability-calibrated), kNN.

TPU-native stand-ins for the reference's sklearn classifier zoo
(`/root/reference/imsegm/classification.py:86-125`): full-batch Adam on
jit-compiled losses; kNN is a brute-force distance matmul (MXU-friendly).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LinearParams(NamedTuple):
    w: jnp.ndarray          # (F, C)
    b: jnp.ndarray          # (C,)


class MLPParams(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def _train(loss_fn, params, steps, lr):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(carry, _):
        params, state = carry
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(step, (params, state), None, length=steps)
    return params


@functools.partial(jax.jit, static_argnames=('n_classes', 'steps'))
def logistic_fit(key, x, y, sample_weight, n_classes, l2=1e-4, steps=300,
                 lr=0.05):
    x = x.astype(jnp.float32)
    onehot = jax.nn.one_hot(y, n_classes)
    params = LinearParams(jnp.zeros((x.shape[1], n_classes)),
                          jnp.zeros((n_classes,)))

    def loss(p):
        logits = x @ p.w + p.b
        ll = jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        return (-jnp.sum(ll * sample_weight) / jnp.maximum(jnp.sum(sample_weight), 1.0)
                + l2 * jnp.sum(p.w ** 2))

    return _train(loss, params, steps, lr)


def logistic_predict_proba(params: LinearParams, x):
    return jax.nn.softmax(x.astype(jnp.float32) @ params.w + params.b, axis=-1)


@functools.partial(jax.jit, static_argnames=('n_classes', 'hidden', 'steps'))
def mlp_fit(key, x, y, sample_weight, n_classes, hidden=64, l2=1e-5,
            steps=500, lr=0.01):
    x = x.astype(jnp.float32)
    f = x.shape[1]
    k1, k2 = jax.random.split(key)
    params = MLPParams(
        jax.random.normal(k1, (f, hidden)) * jnp.sqrt(2.0 / f),
        jnp.zeros((hidden,)),
        jax.random.normal(k2, (hidden, n_classes)) * jnp.sqrt(2.0 / hidden),
        jnp.zeros((n_classes,)))
    onehot = jax.nn.one_hot(y, n_classes)

    def loss(p):
        h = jax.nn.relu(x @ p.w1 + p.b1)
        logits = h @ p.w2 + p.b2
        ll = jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        reg = l2 * (jnp.sum(p.w1 ** 2) + jnp.sum(p.w2 ** 2))
        return (-jnp.sum(ll * sample_weight)
                / jnp.maximum(jnp.sum(sample_weight), 1.0) + reg)

    return _train(loss, params, steps, lr)


def mlp_predict_proba(params: MLPParams, x):
    h = jax.nn.relu(x.astype(jnp.float32) @ params.w1 + params.b1)
    return jax.nn.softmax(h @ params.w2 + params.b2, axis=-1)


@functools.partial(jax.jit, static_argnames=('n_classes', 'steps'))
def linear_svm_fit(key, x, y, sample_weight, n_classes, c_reg=1.0, steps=400,
                   lr=0.05):
    """One-vs-rest squared-hinge linear SVM (sklearn 'SVM' analog; class
    probabilities via softmax over margins, a Platt-style calibration)."""
    x = x.astype(jnp.float32)
    targets = 2.0 * jax.nn.one_hot(y, n_classes) - 1.0
    params = LinearParams(jnp.zeros((x.shape[1], n_classes)),
                          jnp.zeros((n_classes,)))

    def loss(p):
        margins = x @ p.w + p.b
        hinge = jnp.maximum(0.0, 1.0 - targets * margins) ** 2
        data = jnp.sum(hinge * sample_weight[:, None]) \
            / jnp.maximum(jnp.sum(sample_weight), 1.0)
        return c_reg * data + 0.5 * jnp.sum(p.w ** 2) / x.shape[0]

    return _train(loss, params, steps, lr)


class KNNParams(NamedTuple):
    x: jnp.ndarray          # (N, F) training points
    onehot: jnp.ndarray     # (N, C)
    weight: jnp.ndarray     # (N,)
    k: int


def knn_fit(x, y, sample_weight, n_classes, k=5):
    return KNNParams(jnp.asarray(x, jnp.float32),
                     jax.nn.one_hot(y, n_classes),
                     jnp.asarray(sample_weight, jnp.float32), k)


@functools.partial(jax.jit, static_argnames=('k',))
def _knn_proba(train_x, onehot, weight, q, k):
    # squared distances via the MXU: |q|^2 - 2 q.x + |x|^2
    d2 = (jnp.sum(q * q, 1)[:, None] - 2.0 * q @ train_x.T
          + jnp.sum(train_x * train_x, 1)[None, :])
    d2 = jnp.where(weight[None, :] > 0, d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)
    votes = jnp.sum(onehot[idx], axis=1)
    return votes / jnp.maximum(jnp.sum(votes, 1, keepdims=True), 1e-10)


def knn_predict_proba(params: KNNParams, x):
    return _knn_proba(params.x, params.onehot, params.weight,
                      jnp.asarray(x, jnp.float32), params.k)
