"""TPU-resident MRF energy minimisation on the superpixel graph.

The reference minimises  E(l) = sum_i U_i(l_i) + sum_(ij) w_ij * P(l_i, l_j)
with C++ alpha-expansion (gco ``cut_general_graph``,
`/root/reference/imsegm/graph_cuts.py:735-744`).  Here the same energy is
minimised on device with compiler-friendly iterations:

1. **exact shortcut** — ``gc_regul <= 0`` reduces to per-node argmin of the
   unary cost (`graph_cuts.py:729-731`), bit-parity with the reference;
2. **mean-field** — damped categorical mean-field updates: neighbor label
   beliefs are aggregated with two segment-sums over the (static, padded)
   edge list and pushed through the pairwise matrix on the MXU;
3. **ICM polish** — synchronous iterated-conditional-modes sweeps over the
   mean-field solution, keeping the best-energy labelling seen (guards
   against oscillation of parallel updates).

For the well-separated energies this pipeline produces (unaries are clipped
|log p| terms), mean-field+ICM tracks alpha-expansion closely; the native C++
maxflow oracle in ``pyimsegm_tpu.native`` provides an exact cross-check.

All cost constructions replicate the reference numerics exactly: unary
clipping at 0.01 (`graph_cuts.py:36,523-540`), pairwise cap 1e5
(`graph_cuts.py:38`), edge-weight clip to [1e-3, 1e3] (`graph_cuts.py:40`),
relative-spatial division (`graph_cuts.py:647-650`) and the
transition-learned pairwise ``log(1/ratio)`` (`graph_cuts.py:796-832`).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops import graph as graph_ops

#: minimal class probability in the unary term (`graph_cuts.py:36`)
MIN_UNARY_PROB = 0.01
#: maximal pairwise cost (`graph_cuts.py:38`)
MAX_PAIRWISE_COST = 1e5
#: max edge weight; min is its inverse (`graph_cuts.py:40`)
MIN_MAX_EDGE_WEIGHT = 1e3


def compute_unary_cost(proba, min_prob=MIN_UNARY_PROB):
    """``|-log(clip(p, 0.01, 0.99))|`` (`graph_cuts.py:523-540`)."""
    p = jnp.clip(proba, min_prob, 1.0 - min_prob)
    return jnp.abs(-jnp.log(p))


def create_pairwise_matrix_uniform(gc_regul, nb_classes):
    """Uniform Potts matrix with zero diagonal (`graph_cuts.py:442-456`)."""
    return gc_regul * (np.ones((nb_classes, nb_classes)) - np.eye(nb_classes))


def create_pairwise_matrix(gc_regul, nb_classes):
    """Wrapper matching `graph_cuts.py:485-520`: scalar -> uniform;
    matrix -> shifted by its min; list of ((i,j),w) -> specific matrix."""
    if isinstance(gc_regul, np.ndarray) or (hasattr(gc_regul, 'ndim') and getattr(gc_regul, 'ndim', 0) == 2):
        gc_regul = np.asarray(gc_regul)
        if gc_regul.shape[0] != nb_classes or gc_regul.shape[1] != nb_classes:
            raise ValueError('GC regul matrix %r should match classes (%i)'
                             % (gc_regul.shape, nb_classes))
        return gc_regul - np.min(gc_regul)
    if isinstance(gc_regul, (list, tuple)):
        pairwise = np.ones((nb_classes, nb_classes)) - np.eye(nb_classes)
        for (i, j), w in gc_regul:
            pairwise[i, j] = w
            pairwise[j, i] = w
        return pairwise
    return create_pairwise_matrix_uniform(float(gc_regul), nb_classes)


def compute_pairwise_cost(gc_regul, nb_classes, max_cost=MAX_PAIRWISE_COST):
    pairwise = create_pairwise_matrix(gc_regul, nb_classes)
    return np.minimum(np.asarray(pairwise, np.float64), max_cost)


def compute_edge_weights(labels, num_segments, image=None, features=None,
                         proba=None, edge_type='', centers=None):
    """Edge list + weights, all edge types of `graph_cuts.py:574-657`.

    :param labels: (H, W) or (Z, H, W) superpixel map
    :param edge_type: '' | 'spatial' | 'color' | 'features' |
        'model[_l1|_l2|_lT]'
    :returns: (edges (E,2), weights (E,), valid (E,))
    """
    ndim = labels.ndim
    if ndim == 2:
        edges, valid = graph_ops.adjacency_edges_2d(labels, num_segments)
    else:
        edges, valid = graph_ops.adjacency_edges_3d(labels, num_segments)

    if edge_type.startswith('model'):
        if proba is None:
            raise ValueError('"proba" is required for edge_type=model')
        metric = edge_type.split('_')[-1] if '_' in edge_type else 'lT'
        weights = graph_ops.edge_model_weights(edges, valid, proba, metric)
    elif edge_type == 'color':
        if image is None:
            raise ValueError('"image" is required for edge_type=color')
        from pyimsegm_tpu.ops import segment_stats
        img = jnp.asarray(image, jnp.float32)
        img = jnp.where(jnp.max(img) > 1.0, img / 255.0, img)
        mean_color = segment_stats.segment_mean_std_energy(
            img.reshape(-1, img.shape[-1]), labels.ravel(), num_segments,
            flags=('mean',))['mean']
        weights = graph_ops.edge_vector_weights(edges, valid, mean_color, 'l1')
    elif edge_type == 'features':
        if features is None:
            raise ValueError('"features" is required for edge_type=features')
        mu = jnp.mean(features, axis=0)
        sd = jnp.maximum(jnp.std(features, axis=0), 1e-12)
        weights = graph_ops.edge_vector_weights(edges, valid, (features - mu) / sd, 'l2')
    else:
        weights = jnp.ones(edges.shape[0], jnp.float32)

    if edge_type in ('model', 'model_l1', 'model_l2', 'model_lT',
                     'features', 'color', 'spatial'):
        if centers is None:
            centers = graph_ops.superpixel_centers(labels, num_segments, ndim=ndim)
        spatial = graph_ops.compute_spatial_dist(centers, edges, valid, relative=True)
        weights = weights / jnp.maximum(spatial, 1e-12)

    weights = jnp.clip(weights, 1.0 / MIN_MAX_EDGE_WEIGHT, MIN_MAX_EDGE_WEIGHT)
    weights = jnp.where(valid, weights, 0.0)
    return edges, weights, valid


def mrf_energy(labels, unary, edges, weights, pairwise):
    """E(l) = sum_i U_i(l_i) + sum_e w_e * P(l_a, l_b)."""
    u = jnp.sum(jnp.take_along_axis(unary, labels[:, None], axis=1))
    p = pairwise[labels[edges[:, 0]], labels[edges[:, 1]]]
    return u + jnp.sum(weights * p)


def _neighbor_expectation(q, edges, weights, pairwise, num_segments):
    """For every node i: sum_{j in N(i)} w_ij * (P @ q_j)  — two segment-sums
    over the padded edge list (invalid edges carry weight 0).  Full-f32
    matmul passes keep TPU and CPU mean-field trajectories aligned (the
    cross-backend ARS acceptance, see models/gmm.full_precision)."""
    with jax.default_matmul_precision('highest'):
        msg_to_a = (q[edges[:, 1]] @ pairwise.T) * weights[:, None]
        msg_to_b = (q[edges[:, 0]] @ pairwise.T) * weights[:, None]
    agg = jax.ops.segment_sum(msg_to_a, edges[:, 0], num_segments=num_segments)
    agg += jax.ops.segment_sum(msg_to_b, edges[:, 1], num_segments=num_segments)
    return agg


@functools.partial(jax.jit, static_argnames=('n_mf_iters', 'n_icm_iters',
                                              'n_expand_rounds',
                                              'n_move_steps', 'n_chains'))
def solve_mrf(unary, edges, weights, pairwise, n_mf_iters=30, n_icm_iters=12,
              damping=0.5, n_expand_rounds=12, n_move_steps=8, n_chains=4,
              move_noise=0.6):
    """Minimise the superpixel MRF on device.

    Schedule: damped mean field -> synchronous ICM polish -> vmapped
    stochastic expansion-move chains.  Each chain sweeps labels alpha in a
    random per-round order; the binary keep-vs-alpha subproblem is relaxed
    with a damped binary mean field (soft move indicator b_i, neighbor
    expectations under the mixed distribution), hardened at b > 0.5.  The
    chain always steps to the hardened candidate (like true expansion, every
    move is taken) while the best-energy labelling seen is tracked
    separately; chains differ in sweep order and in the noise of the b_i
    initialisation, and the global best over chains is returned.  The soft
    relaxation recovers the coordinated multi-node moves ICM cannot make
    (all movers share the target label, so joint switches are pairwise
    free); measured energy gap to the exact alpha-expansion oracle
    (`pyimsegm_tpu.native.alpha_expansion`, reference
    `graph_cuts.py:735-744`) on adversarial dense random graphs is ~0.05%
    mean / ~0.1% worst-case with the defaults (tests/test_graphcut.py).

    :param unary: (K, C) float32 costs
    :param edges: (E, 2) int32 padded edge list
    :param weights: (E,) float32, 0 on padding
    :param pairwise: (C, C) float32 cost matrix
    :param n_expand_rounds: full label sweeps per chain (0 disables)
    :param n_move_steps: binary mean-field iterations per expansion move
    :param n_chains: independent stochastic chains (vmapped; best wins)
    :param move_noise: amplitude of the uniform noise around the b=0.5 init
    :returns: (K,) int32 labels
    """
    k, c = unary.shape
    pairwise = jnp.asarray(pairwise, jnp.float32)
    unary = jnp.asarray(unary, jnp.float32)

    # --- damped mean field ---------------------------------------------
    q0 = jax.nn.softmax(-unary, axis=-1)

    def mf_step(_, q):
        msg = _neighbor_expectation(q, edges, weights, pairwise, k)
        q_new = jax.nn.softmax(-(unary + msg), axis=-1)
        return damping * q_new + (1.0 - damping) * q

    q = jax.lax.fori_loop(0, n_mf_iters, mf_step, q0)
    labels = jnp.argmin(unary + _neighbor_expectation(q, edges, weights, pairwise, k),
                        axis=-1).astype(jnp.int32)

    # --- synchronous ICM polish, keep best-energy state ----------------
    def icm_step(_, carry):
        labels, best_labels, best_e = carry
        onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
        msg = _neighbor_expectation(onehot, edges, weights, pairwise, k)
        new_labels = jnp.argmin(unary + msg, axis=-1).astype(jnp.int32)
        e = mrf_energy(new_labels, unary, edges, weights, pairwise)
        improved = e < best_e
        best_labels = jnp.where(improved, new_labels, best_labels)
        best_e = jnp.where(improved, e, best_e)
        return new_labels, best_labels, best_e

    e0 = mrf_energy(labels, unary, edges, weights, pairwise)
    _, best_labels, best_e = jax.lax.fori_loop(
        0, n_icm_iters, icm_step, (labels, labels, e0))

    if n_expand_rounds == 0 or n_chains == 0:
        return best_labels

    # --- stochastic expansion-move chains (vmapped, best-of wins) -------
    # per-chain, per-round random label orders: trace-time constants
    order_rng = np.random.RandomState(0)
    orders = np.stack([
        np.concatenate([order_rng.permutation(c)
                        for _ in range(n_expand_rounds)])
        for _ in range(n_chains)]).astype(np.int32)  # (chains, rounds*c)

    def run_chain(key, chain_order):
        def move(t, carry):
            cur, bl, be = carry
            alpha = chain_order[t]
            u_alpha = unary[:, alpha]
            noise = jax.random.uniform(jax.random.fold_in(key, t), (k,))
            b = 0.5 + (noise - 0.5) * move_noise
            oh_cur = jax.nn.one_hot(cur, c, dtype=jnp.float32)
            oh_alpha = jax.nn.one_hot(jnp.full((k,), alpha), c,
                                      dtype=jnp.float32)
            u_cur = jnp.take_along_axis(unary, cur[:, None], 1)[:, 0]

            def mf_step(_, b):
                q = (1.0 - b[:, None]) * oh_cur + b[:, None] * oh_alpha
                msg = _neighbor_expectation(q, edges, weights, pairwise, k)
                c_keep = u_cur + jnp.take_along_axis(msg, cur[:, None], 1)[:, 0]
                c_alpha = u_alpha + msg[:, alpha]
                b_new = jax.nn.sigmoid(c_keep - c_alpha)
                return damping * b_new + (1.0 - damping) * b

            b = jax.lax.fori_loop(0, n_move_steps, mf_step, b)
            cand = jnp.where(b > 0.5, alpha, cur).astype(jnp.int32)
            e = mrf_energy(cand, unary, edges, weights, pairwise)
            improved = e < be
            bl = jnp.where(improved, cand, bl)
            be = jnp.where(improved, e, be)
            return cand, bl, be  # chain always steps to the candidate

        _, bl, be = jax.lax.fori_loop(
            0, n_expand_rounds * c, move, (best_labels, best_labels, best_e))
        return bl, be

    keys = jax.random.split(jax.random.PRNGKey(42), n_chains)
    chain_labels, chain_e = jax.vmap(run_chain)(keys, jnp.asarray(orders))
    winner = jnp.argmin(chain_e)
    return jnp.where(chain_e[winner] < best_e, chain_labels[winner],
                     best_labels)


def segment_graph_cut_general(labels, proba, num_segments, image=None,
                              features=None, gc_regul=1.0, edge_type='model',
                              edge_cost=1.0, grid_ctx=None, centers=None,
                              grid_ctx3d=None):
    """End-to-end MRF stage matching `graph_cuts.py:660-747`.

    :param labels: (H, W) superpixel map (device array)
    :param proba: (K, C) class probabilities
    :param grid_ctx: optional (labels2d, SlicConfig) enabling scatter-free
        center computation for grid-structured SLIC labels
    :returns: (K,) int32 class per superpixel
    """
    unary = compute_unary_cost(proba)
    scalar_regul = np.isscalar(gc_regul)
    if scalar_regul and gc_regul <= 0:
        return jnp.argmin(unary, axis=-1).astype(jnp.int32)
    pairwise = compute_pairwise_cost(gc_regul, proba.shape[1])
    if grid_ctx is not None:
        # dense 25-neighbor grid graph: no hash sort, no scatters
        from pyimsegm_tpu.ops import grid as grid_ops
        from pyimsegm_tpu.ops import segment_stats
        labels2d, cfg = grid_ctx
        mean_color = None
        if edge_type == 'color':
            img = jnp.asarray(image, jnp.float32)
            img = jnp.where(jnp.max(img) > 1.0, img / 255.0, img)
            csum = grid_ops.grid_segment_sum(
                jnp.concatenate([img, jnp.ones(img.shape[:2] + (1,), jnp.float32)], -1),
                labels2d, cfg)
            mean_color = csum[:, :-1] / jnp.maximum(csum[:, -1:], 1.0)
        wgrid = grid_ops.grid_edge_weights(
            labels2d, cfg, proba=proba, features=features,
            mean_color=mean_color, edge_type=edge_type,
            centers=centers) * edge_cost
        return grid_ops.solve_mrf_grid(unary, wgrid,
                                       jnp.asarray(pairwise, jnp.float32), cfg)
    edges, weights, valid = compute_edge_weights(
        labels, num_segments, image=image, features=features, proba=proba,
        edge_type=edge_type)
    weights = weights * edge_cost
    if grid_ctx3d is not None:
        # grid-structured supervoxels: solve on the dense 125-neighbour
        # structure (the edge-list solver's per-iteration scatters cost ~6 s
        # at 23.6 MVox bench scale, tools/profile_cfg6.py)
        from pyimsegm_tpu.ops import slic3d as slic3d_ops
        _labels3d, cfg3 = grid_ctx3d
        wgrid = slic3d_ops.wgrid3d_from_edges(edges, valid, weights, cfg3)
        return slic3d_ops.solve_mrf_grid3d(
            unary, wgrid, jnp.asarray(pairwise, jnp.float32), cfg3)
    return solve_mrf(unary, edges, weights, jnp.asarray(pairwise, jnp.float32))


def count_label_transitions_connected_segments(list_slics, list_labels, nb_labels):
    """Count class transitions along superpixel adjacency over a dataset
    (`graph_cuts.py:750-793`); host-side, returns (nb_labels, nb_labels)."""
    trans = np.zeros((nb_labels, nb_labels))
    for slic, labels in zip(list_slics, list_labels):
        k = int(np.max(slic)) + 1
        edges, valid = graph_ops.adjacency_edges_2d(jnp.asarray(slic), k)
        edges = np.asarray(edges)[np.asarray(valid)]
        lab = np.asarray(labels)
        for l1, l2 in lab[edges]:
            trans[l1, l2] += 1
            trans[l2, l1] += 1
    trans[np.diag_indices_from(trans)] /= 2
    return trans


def compute_pairwise_cost_from_transitions(trans, min_prob=1e-9):
    """``log(1/ratio)`` pairwise from transition counts
    (`graph_cuts.py:796-832`)."""
    trans = np.asarray(trans, np.float64)
    if trans.ndim == 1:
        trans = np.tile(trans, (len(trans), 1))
    ratio = trans / np.sum(trans, axis=0, keepdims=True)
    n = len(ratio)
    for i in range(1, n):
        for j in range(i):
            el = max(ratio[i, j], ratio[j, i])
            ratio[i, j] = el
            ratio[j, i] = el
    ratio = np.maximum(ratio, min_prob)
    return np.log(1.0 / ratio)
