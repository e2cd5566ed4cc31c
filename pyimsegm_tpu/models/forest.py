"""Random forest, trained and evaluated on device.

TPU-native replacement for the reference's default sklearn
``RandomForestClassifier`` (`/root/reference/imsegm/classification.py:96-101`).
Trees are grown breadth-first with *all nodes of a depth level trained
simultaneously*: node membership is an integer vector, candidate splits are
scored with Gini impurity via segment-sums keyed on (tree, node), and the
best candidate per node is selected with one argmin — no per-node recursion,
no host round-trips.  Split thresholds follow the extra-trees scheme (uniform
within the node's feature range), which keeps the search vectorizable and is
statistically comparable to exact CART search at forest level.

Prediction walks all trees in lockstep (depth gathers) and averages leaf
class distributions.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ForestParams(NamedTuple):
    feat: jnp.ndarray    # (T, n_nodes) int32 split feature per internal node
    thr: jnp.ndarray     # (T, n_nodes) float32 split threshold
    leaf_proba: jnp.ndarray  # (T, n_leaves, C) class distribution per leaf
    depth: int

    @property
    def n_classes(self):
        return self.leaf_proba.shape[-1]


@functools.partial(jax.jit,
                   static_argnames=('n_trees', 'depth', 'n_classes',
                                    'n_candidates', 'bootstrap'))
def forest_fit(key, x, y, sample_weight, n_classes, n_trees=32, depth=8,
               n_candidates=8, bootstrap=True):
    """Fit the forest.

    :param x: (N, F) float32
    :param y: (N,) int32 class labels
    :param sample_weight: (N,) float32, 0 = ignore
    :returns: ForestParams
    """
    n, f = x.shape
    t = n_trees
    x = x.astype(jnp.float32)
    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)

    k_boot, k_split = jax.random.split(key)
    if bootstrap:
        # Poisson(1) bootstrap weights per tree — equivalent in expectation to
        # sampling-with-replacement, fully vectorised
        boot = jax.random.poisson(k_boot, 1.0, (t, n)).astype(jnp.float32)
    else:
        boot = jnp.ones((t, n), jnp.float32)
    w = boot * sample_weight[None, :]                        # (T, N)

    # node index per (tree, sample); root = 0; child = 2*node+1 / 2*node+2
    node = jnp.zeros((t, n), jnp.int32)
    n_internal = 2 ** depth - 1
    feat_store = jnp.zeros((t, n_internal), jnp.int32)
    thr_store = jnp.zeros((t, n_internal), jnp.float32)

    keys = jax.random.split(k_split, depth)
    for d in range(depth):
        level_nodes = 2 ** d
        level_off = 2 ** d - 1
        seg = node - level_off                               # 0..level_nodes-1
        seg_id = (jax.lax.broadcasted_iota(jnp.int32, (t, n), 0) * level_nodes
                  + seg).ravel()
        n_seg = t * level_nodes

        kf, kt = jax.random.split(keys[d])
        cand_feat = jax.random.randint(kf, (n_seg, n_candidates), 0, f)
        cand_u = jax.random.uniform(kt, (n_seg, n_candidates))

        w_flat = w.ravel()
        best_gini = jnp.full((n_seg,), jnp.inf)
        best_feat = jnp.zeros((n_seg,), jnp.int32)
        best_thr = jnp.zeros((n_seg,), jnp.float32)

        # per-node totals (shared across candidates)
        tot_cnt = jax.ops.segment_sum(w_flat, seg_id, num_segments=n_seg)
        tot_cls = jax.ops.segment_sum(w_flat[:, None] * jnp.tile(onehot, (t, 1)),
                                      seg_id, num_segments=n_seg)

        xv_tiled = jnp.tile(x, (t, 1))                       # (T*N, F)
        oh_tiled = jnp.tile(onehot, (t, 1))                  # (T*N, C)

        # node-wise per-feature min/max for threshold sampling
        big = 1e30
        wpos = w_flat > 0
        x_min = jax.ops.segment_min(
            jnp.where(wpos[:, None], xv_tiled, big), seg_id, num_segments=n_seg)
        x_max = jax.ops.segment_max(
            jnp.where(wpos[:, None], xv_tiled, -big), seg_id, num_segments=n_seg)

        for c in range(n_candidates):
            fc = cand_feat[:, c]                             # (n_seg,)
            lo = jnp.take_along_axis(x_min, fc[:, None], 1)[:, 0]
            hi = jnp.take_along_axis(x_max, fc[:, None], 1)[:, 0]
            thr = lo + cand_u[:, c] * (hi - lo)
            # per-sample: which feature value / does it go left
            fv = jnp.take_along_axis(xv_tiled, fc[seg_id][:, None], 1)[:, 0]
            go_left = (fv < thr[seg_id]).astype(jnp.float32) * w_flat
            lcls = jax.ops.segment_sum(go_left[:, None] * oh_tiled, seg_id,
                                       num_segments=n_seg)
            lcnt = jnp.sum(lcls, axis=1)
            rcls = tot_cls - lcls
            rcnt = tot_cnt - lcnt

            def gini(cls, cnt):
                p = cls / jnp.maximum(cnt, 1e-10)[:, None]
                return 1.0 - jnp.sum(p * p, axis=1)

            score = (lcnt * gini(lcls, lcnt) + rcnt * gini(rcls, rcnt)) \
                / jnp.maximum(tot_cnt, 1e-10)
            degenerate = (lcnt < 1e-6) | (rcnt < 1e-6)
            score = jnp.where(degenerate, jnp.inf, score)
            take = score < best_gini
            best_gini = jnp.where(take, score, best_gini)
            best_feat = jnp.where(take, fc, best_feat)
            best_thr = jnp.where(take, thr, best_thr)

        # unsplittable nodes: route everything right with thr=-inf
        no_split = ~jnp.isfinite(best_gini)
        best_thr = jnp.where(no_split, -big, best_thr)

        feat_store = feat_store.at[:, level_off:level_off + level_nodes].set(
            best_feat.reshape(t, level_nodes))
        thr_store = thr_store.at[:, level_off:level_off + level_nodes].set(
            best_thr.reshape(t, level_nodes))

        # descend
        fv = jnp.take_along_axis(xv_tiled, best_feat[seg_id][:, None], 1)[:, 0]
        left = fv < best_thr[seg_id]
        node = (2 * node + jnp.where(left.reshape(t, n), 1, 2))

    # leaves: class histograms
    n_leaves = 2 ** depth
    leaf = node - (2 ** depth - 1)
    leaf_id = (jax.lax.broadcasted_iota(jnp.int32, (t, n), 0) * n_leaves
               + leaf).ravel()
    leaf_cls = jax.ops.segment_sum(w.ravel()[:, None] * jnp.tile(onehot, (t, 1)),
                                   leaf_id, num_segments=t * n_leaves)
    # empty leaves fall back to the global prior
    prior = jnp.sum(onehot * sample_weight[:, None], axis=0)
    prior = prior / jnp.maximum(jnp.sum(prior), 1e-10)
    cnt = jnp.sum(leaf_cls, axis=1, keepdims=True)
    proba = jnp.where(cnt > 0, leaf_cls / jnp.maximum(cnt, 1e-10), prior[None])
    return ForestParams(feat_store, thr_store,
                        proba.reshape(t, n_leaves, -1), depth)


@functools.partial(jax.jit, static_argnames=('depth', 'reduce_mean'))
def _forest_predict_jit(feat, thr_store, leaf_proba, depth, x,
                        reduce_mean=True):
    x = x.astype(jnp.float32)
    t = feat.shape[0]
    n = x.shape[0]
    node = jnp.zeros((t, n), jnp.int32)
    for _ in range(depth):
        fidx = jnp.take_along_axis(feat, node, axis=1)           # (T, N)
        thr = jnp.take_along_axis(thr_store, node, axis=1)
        fv = x[jnp.arange(n)[None, :], fidx]
        node = 2 * node + jnp.where(fv < thr, 1, 2)
    leaf = node - (2 ** depth - 1)
    probs = jnp.take_along_axis(
        leaf_proba, leaf[..., None], axis=1)                      # (T, N, C)
    return jnp.mean(probs, axis=0) if reduce_mean else probs


def forest_predict_proba(params: ForestParams, x):
    """(N, C) averaged leaf distributions."""
    return _forest_predict_jit(params.feat, params.thr, params.leaf_proba,
                               int(params.depth), x)
