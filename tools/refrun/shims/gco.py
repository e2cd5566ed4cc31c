"""`gco` (pyGCO) stand-in backed by this repo's own C++ alpha-expansion.

The reference minimises its superpixel MRFs with
``gco.cut_general_graph(..., algorithm='expansion')``
(`/root/reference/imsegm/graph_cuts.py:735-744`).  pyGCO is not installed
here; the exact Dinic-max-flow alpha-expansion oracle from
``pyimsegm_tpu/native`` solves the identical energy
    E(l) = sum_i unary[i, l_i] + sum_(i,j) w_ij * pairwise[l_i, l_j]
so label maps produced through this shim are true expansion-move optima of
the reference's energies (same move structure; per-move subproblems solved
exactly by max-flow in both).
"""

import numpy as np


def cut_general_graph(edges, edge_weights, unary_cost, pairwise_cost,
                      algorithm='expansion', n_iter=-1, **_kwargs):
    from pyimsegm_tpu import native
    unary_cost = np.asarray(unary_cost, dtype=np.float64)
    if len(np.asarray(edges).reshape(-1)) == 0:
        return np.argmin(unary_cost, axis=1).astype(np.int32)
    labels, _energy = native.alpha_expansion(
        np.asarray(edges), np.asarray(edge_weights, dtype=np.float64),
        unary_cost, np.asarray(pairwise_cost, dtype=np.float64),
        n_iter=n_iter)
    return labels
