"""Histogram gradient-boosted trees, trained and evaluated on device.

True boosting replacement for the reference's sklearn
``GradientBoostingClassifier`` (`/root/reference/imsegm/classification.py:95-101`)
— round-1 review flagged the previous forest-variant stand-in.

Design (TPU-first, exact greedy splits within feature binning):

* Features are quantile-binned once (``B`` bins, default 64); after that the
  fit touches only int8-sized bin indices and per-bin gradient/hessian
  histograms — the LightGBM recipe, which maps onto XLA as segment-sums.
* Multiclass softmax boosting: per round the gradient ``g = p - onehot(y)``
  and hessian ``h = p (1 - p)`` feed one regression tree per class; the
  per-class trees are fitted together by ``vmap`` (class = batch axis).
* Trees grow breadth-first, all nodes of a level at once (same
  level-synchronous scheme as ``models/forest``): one segment-sum keyed by
  ``(node, feature, bin)`` builds every histogram of the level, a cumulative
  sum over bins turns them into left/right split statistics for *all*
  candidate thresholds simultaneously, and one argmax picks the best
  (feature, bin) per node — no per-node recursion, no host round-trips.
* Leaf values are Newton steps ``-G / (H + lambda)``; rounds advance under
  ``lax.scan`` so the program size is independent of ``n_rounds``.

Prediction walks all (round, class) trees in lockstep and accumulates
``learning_rate * leaf`` into the raw scores, starting from the class
log-prior.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GBTParams(NamedTuple):
    feat: jnp.ndarray       # (R, C, n_internal) int32 split feature
    thr: jnp.ndarray        # (R, C, n_internal) float32 split threshold
    leaf: jnp.ndarray       # (R, C, n_leaves) float32 leaf value
    base_score: jnp.ndarray  # (C,) initial raw score (log prior)
    learning_rate: float
    depth: int

    @property
    def n_classes(self):
        return self.base_score.shape[0]


def _quantile_bin_edges(x, sample_weight, n_bins):
    """(F, B-1) interior bin edges from weighted quantiles.

    Padded rows (weight 0) are pushed to +inf before sorting so they land in
    the top quantiles and cannot distort the edges as long as padding is a
    minority; ties collapse edges, which simply wastes bins.
    """
    big = jnp.float32(3.4e38)
    xq = jnp.where(sample_weight[:, None] > 0, x, big)
    xs = jnp.sort(xq, axis=0)                                  # (N, F)
    n_real = jnp.maximum(jnp.sum(sample_weight > 0), 1)
    q = (jnp.arange(1, n_bins, dtype=jnp.float32) / n_bins
         * (n_real.astype(jnp.float32) - 1.0))
    idx = jnp.clip(q.astype(jnp.int32), 0, x.shape[0] - 1)
    return xs[idx].T                                           # (F, B-1)


def _bin_features(x, edges):
    """(N, F) int32 bin index via vectorised binary search over edges."""
    # edges: (F, B-1) ascending; bin = #edges <= value
    return jnp.sum(x[:, :, None] >= edges[None], axis=-1).astype(jnp.int32)


def _fit_level_trees(bins, g, h, n_bins, depth, reg_lambda, edges_full):
    """Fit one regression tree on (g, h) — used per class via vmap.

    :param bins: (N, F) int32
    :param g, h: (N,) float32 gradient / hessian (hessian 0 = padded slot)
    :param edges_full: (F, B) thresholds to store per (feature, bin) —
        ``edges_full[f, b]`` is the float threshold meaning "bin <= b goes
        left", precomputed on host side of the vmap
    :returns: (feat (n_internal,), thr (n_internal,), leaf (n_leaves,))
    """
    n, f = bins.shape
    n_internal = 2 ** depth - 1
    node = jnp.zeros((n,), jnp.int32)
    feat_store = jnp.zeros((n_internal,), jnp.int32)
    thr_store = jnp.full((n_internal,), -3.4e38, jnp.float32)

    for d in range(depth):
        level_nodes = 2 ** d
        level_off = 2 ** d - 1
        seg = node - level_off                                 # (N,)
        # one segment id per (node, feature, bin)
        seg_id = ((seg[:, None] * f + jnp.arange(f)[None, :]) * n_bins
                  + bins).ravel()
        n_seg = level_nodes * f * n_bins
        gh = jnp.stack([jnp.broadcast_to(g[:, None], (n, f)).ravel(),
                        jnp.broadcast_to(h[:, None], (n, f)).ravel()], axis=-1)
        hist = jax.ops.segment_sum(gh, seg_id, num_segments=n_seg)
        hist = hist.reshape(level_nodes, f, n_bins, 2)

        cum = jnp.cumsum(hist, axis=2)                         # left stats
        gl, hl = cum[..., 0], cum[..., 1]                      # (L, F, B)
        gt, ht = cum[..., -1:, 0], cum[..., -1:, 1]            # totals (L, F, 1)
        gr, hr = gt - gl, ht - hl

        def half_gain(gs, hs):
            return gs * gs / (hs + reg_lambda)

        gain = (half_gain(gl, hl) + half_gain(gr, hr)
                - half_gain(gt, ht))                           # (L, F, B)
        # the last bin puts everything left — not a split
        valid = (jnp.arange(n_bins)[None, None, :] < n_bins - 1) \
            & (hl > 1e-12) & (hr > 1e-12)
        gain = jnp.where(valid, gain, -jnp.inf)

        flat = gain.reshape(level_nodes, f * n_bins)
        best = jnp.argmax(flat, axis=1)                        # (L,)
        best_gain = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        best_feat = (best // n_bins).astype(jnp.int32)
        best_bin = (best % n_bins).astype(jnp.int32)
        # threshold as float so prediction binning-free; -inf => no split
        thr = edges_full[best_feat, best_bin]
        no_split = ~jnp.isfinite(best_gain) | (best_gain <= 0.0)
        thr = jnp.where(no_split, -3.4e38, thr)

        feat_store = jax.lax.dynamic_update_slice(feat_store, best_feat,
                                                  (level_off,))
        thr_store = jax.lax.dynamic_update_slice(thr_store, thr, (level_off,))

        # descend: bin <= best_bin goes left (unsplit nodes route all right,
        # matching their -3.4e38 stored threshold at prediction time)
        bv = jnp.take_along_axis(bins, best_feat[seg][:, None], 1)[:, 0]
        left = (bv <= best_bin[seg]) & ~no_split[seg]
        node = 2 * node + jnp.where(left, 1, 2)

    n_leaves = 2 ** depth
    leaf_seg = node - n_internal
    gL = jax.ops.segment_sum(g, leaf_seg, num_segments=n_leaves)
    hL = jax.ops.segment_sum(h, leaf_seg, num_segments=n_leaves)
    leaf = -gL / (hL + reg_lambda)
    return feat_store, thr_store, leaf


@functools.partial(jax.jit, static_argnames=('n_classes', 'n_rounds', 'depth',
                                             'n_bins'))
def gbt_fit(x, y, sample_weight, n_classes, n_rounds=64, depth=4,
            learning_rate=0.1, n_bins=64, reg_lambda=1.0):
    """Fit multiclass histogram GBT.

    :param x: (N, F) float32
    :param y: (N,) int32
    :param sample_weight: (N,) float32, 0 = padded slot
    :returns: :class:`GBTParams`
    """
    x = x.astype(jnp.float32)
    n, f = x.shape
    w = sample_weight.astype(jnp.float32)
    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32) * w[:, None]

    edges = _quantile_bin_edges(x, w, n_bins)                  # (F, B-1)
    bins = _bin_features(x, edges)                             # (N, F)
    # threshold lookup per (feature, bin): "bin <= b" == "value < edges[b]"
    edges_full = jnp.concatenate([edges, jnp.full((f, 1), 3.4e38)], axis=1)

    prior = jnp.sum(onehot, axis=0)
    base = jnp.log(jnp.maximum(prior / jnp.maximum(jnp.sum(prior), 1e-10),
                               1e-10))

    fit_one = jax.vmap(
        lambda gg, hh: _fit_level_trees(bins, gg, hh, n_bins, depth,
                                        reg_lambda, edges_full))

    def round_step(scores, _):
        p = jax.nn.softmax(scores, axis=-1)
        g = (p * w[:, None] - onehot).T                        # (C, N)
        h = (p * (1.0 - p) * w[:, None]).T                     # (C, N)
        feat, thr, leaf = fit_one(g, h)                        # (C, ...)

        # evaluate this round's trees to update the raw scores
        node = jnp.zeros((n_classes, n), jnp.int32)
        for _d in range(depth):
            fidx = jnp.take_along_axis(feat, node, axis=1)     # (C, N)
            tv = jnp.take_along_axis(thr, node, axis=1)
            fv = x[jnp.arange(n)[None, :], fidx]
            node = 2 * node + jnp.where(fv < tv, 1, 2)
        lv = jnp.take_along_axis(leaf, node - (2 ** depth - 1), axis=1)
        scores = scores + learning_rate * lv.T                 # (N, C)
        return scores, (feat, thr, leaf)

    scores0 = jnp.broadcast_to(base[None], (n, n_classes))
    _, (feats, thrs, leaves) = jax.lax.scan(round_step, scores0, None,
                                            length=n_rounds)
    return GBTParams(feats, thrs, leaves, base, learning_rate, depth)


@functools.partial(jax.jit, static_argnames=('depth',))
def _gbt_raw_scores(feat, thr, leaf, base, lr, depth, x):
    x = x.astype(jnp.float32)
    r, c, _ = feat.shape
    n = x.shape[0]
    fr = feat.reshape(r * c, -1)
    tr = thr.reshape(r * c, -1)
    lv = leaf.reshape(r * c, -1)
    node = jnp.zeros((r * c, n), jnp.int32)
    for _ in range(depth):
        fidx = jnp.take_along_axis(fr, node, axis=1)           # (RC, N)
        tv = jnp.take_along_axis(tr, node, axis=1)
        fv = x[jnp.arange(n)[None, :], fidx]
        node = 2 * node + jnp.where(fv < tv, 1, 2)
    vals = jnp.take_along_axis(lv, node - (2 ** depth - 1), axis=1)
    scores = jnp.sum(vals.reshape(r, c, n), axis=0).T          # (N, C)
    return base[None, :] + lr * scores


def gbt_predict_proba(params: GBTParams, x):
    """(N, C) softmax class probabilities."""
    raw = _gbt_raw_scores(params.feat, params.thr, params.leaf,
                          params.base_score, params.learning_rate,
                          int(params.depth), x)
    return jax.nn.softmax(raw, axis=-1)
