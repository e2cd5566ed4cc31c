"""Graph construction + MRF solver tests, pinned to reference numerics."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu.ops import graph as graph_ops
from pyimsegm_tpu.ops import graphcut


def _ref_segments():
    # from the reference doctest `graph_cuts.py:587-595`
    return np.array([[0] * 3 + [1] * 5 + [2] * 4,
                     [4] * 4 + [5] * 5 + [6] * 3])


def test_adjacency_edges_match_reference_doctest():
    segments = _ref_segments()
    edges, valid = graph_ops.adjacency_edges_2d(jnp.asarray(segments), 7)
    got = sorted(map(tuple, np.asarray(edges)[np.asarray(valid)]))
    # reference edge set `graph_cuts.py:594-595` (sorted-pair form)
    assert got == sorted([(0, 1), (1, 2), (0, 4), (1, 4), (1, 5), (2, 5),
                          (4, 5), (2, 6), (5, 6)])


def test_superpixel_centers():
    segm = np.array([[0] * 6 + [1] * 5, [0] * 6 + [2] * 5])
    centers = np.asarray(graph_ops.superpixel_centers(jnp.asarray(segm), 3))
    # reference doctest superpixels.py:211-213
    np.testing.assert_allclose(centers, [[0.5, 2.5], [0.0, 8.0], [1.0, 8.0]])


def test_unary_cost_formula():
    proba = np.array([[0.99, 0.01], [0.5, 0.5], [0.001, 0.999]])
    unary = np.asarray(graphcut.compute_unary_cost(jnp.asarray(proba)))
    np.testing.assert_allclose(unary[0], [abs(-np.log(0.99)), abs(-np.log(0.01))],
                               rtol=1e-4)
    # clipping at 0.01/0.99 (graph_cuts.py:36)
    np.testing.assert_allclose(unary[2], [abs(-np.log(0.01)), abs(-np.log(0.99))],
                               rtol=1e-4)


def test_pairwise_matrix_uniform_and_transitions():
    pw = graphcut.create_pairwise_matrix(0.6, 3)
    np.testing.assert_allclose(pw, 0.6 * (np.ones((3, 3)) - np.eye(3)))
    # golden from graph_cuts.py:803-817
    trans = np.array([[25., 5., 0.], [5., 10., 8.], [0., 8., 30.]])
    got = np.round(graphcut.compute_pairwise_cost_from_transitions(trans), 3)
    np.testing.assert_allclose(got, [[0.182, 1.526, 20.723],
                                     [1.526, 0.833, 1.056],
                                     [20.723, 1.056, 0.236]], atol=1e-3)
    got1 = np.round(graphcut.compute_pairwise_cost_from_transitions(np.ones(3)), 2)
    np.testing.assert_allclose(got1, np.full((3, 3), 1.1))
    got2 = np.round(graphcut.compute_pairwise_cost_from_transitions(np.eye(3)), 2)
    np.testing.assert_allclose(got2, 20.72 * (np.ones((3, 3)) - np.eye(3)))


def test_argmin_shortcut_matches_reference_doctest():
    """gc_regul<=0 -> pure argmin of unary (graph_cuts.py:729-731)."""
    rng = np.random.default_rng(0)
    segments = np.array([[0] * 3 + [2] * 3 + [4] * 3 + [6] * 3 + [8] * 3,
                         [1] * 3 + [3] * 3 + [5] * 3 + [7] * 3 + [9] * 3])
    proba = np.array([[0.1] * 6 + [0.9] * 4, [0.9] * 6 + [0.1] * 4], dtype=float).T
    proba += (0.5 - rng.random(proba.shape)) * 0.2
    labels = graphcut.segment_graph_cut_general(
        jnp.asarray(segments), jnp.asarray(proba), 10, gc_regul=0.0, edge_type='')
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.argmin(np.asarray(graphcut.compute_unary_cost(proba)), axis=1))


def test_mrf_solver_regularises_noisy_labels():
    """A noisy strip labeling should be cleaned up by the pairwise term."""
    rng = np.random.default_rng(1)
    h, w = 20, 30
    segments = np.arange(h * w).reshape(h, w)  # one superpixel per pixel
    true = (np.mgrid[:h, :w][1] >= w // 2).astype(int).ravel()
    proba = np.stack([1.0 - true, true * 1.0], axis=1) * 0.8 + 0.1
    flip = rng.random(h * w) < 0.15
    proba[flip] = proba[flip][:, ::-1]
    noisy = proba.argmax(1)
    assert (noisy != true).mean() > 0.05
    labels = graphcut.segment_graph_cut_general(
        jnp.asarray(segments), jnp.asarray(proba), h * w,
        gc_regul=2.0, edge_type='')
    err = (np.asarray(labels) != true).mean()
    assert err < 0.02


def test_mrf_energy_not_worse_than_argmin():
    """The solver's labeling energy must be <= the unary-argmin energy."""
    rng = np.random.default_rng(2)
    segments = rng.integers(0, 30, size=(20, 20))
    proba = rng.dirichlet(np.ones(3), size=30)
    unary = jnp.asarray(graphcut.compute_unary_cost(proba), jnp.float32)
    edges, weights, valid = graphcut.compute_edge_weights(
        jnp.asarray(segments), 30, edge_type='')
    pairwise = jnp.asarray(graphcut.compute_pairwise_cost(1.0, 3), jnp.float32)
    solved = graphcut.solve_mrf(unary, edges, weights, pairwise)
    e_solved = graphcut.mrf_energy(solved, unary, edges, weights, pairwise)
    e_argmin = graphcut.mrf_energy(jnp.argmin(unary, 1).astype(jnp.int32),
                                   unary, edges, weights, pairwise)
    assert float(e_solved) <= float(e_argmin) + 1e-3


def test_mrf_energy_close_to_exact_oracle():
    """On adversarial dense random graphs (E/K = 3, uniform random unaries
    and weights — far worse separated than pipeline graphs) the device
    solver's energy must stay within 1% of the exact C++ alpha-expansion
    oracle (reference behaviour: `graph_cuts.py:735-744`)."""
    from pyimsegm_tpu import native
    rng = np.random.default_rng(7)
    gaps = []
    for _ in range(3):
        k, c = 300, 4
        edges = rng.integers(0, k, size=(3 * k, 2)).astype(np.int32)
        edges = edges[edges[:, 0] != edges[:, 1]]
        weights = rng.uniform(0.1, 2.0, size=len(edges)).astype(np.float32)
        unary = rng.uniform(0, 3, size=(k, c)).astype(np.float32)
        pairwise = np.float32(graphcut.create_pairwise_matrix_uniform(1.0, c))
        _, e_exact = native.alpha_expansion(edges, weights, unary, pairwise)
        lab = graphcut.solve_mrf(jnp.asarray(unary), jnp.asarray(edges),
                                 jnp.asarray(weights), jnp.asarray(pairwise))
        e_dev = float(graphcut.mrf_energy(
            lab, jnp.asarray(unary), jnp.asarray(edges),
            jnp.asarray(weights), jnp.asarray(pairwise)))
        gaps.append((e_dev - e_exact) / e_exact)
    assert max(gaps) < 0.01, gaps


@pytest.mark.parametrize('edge_type', ['', 'spatial', 'color', 'features', 'model'])
def test_edge_weight_types(edge_type):
    rng = np.random.default_rng(3)
    segments = _ref_segments()
    image = rng.random(segments.shape + (3,))
    features = rng.random((7, 5)).astype(np.float32)
    proba = rng.dirichlet(np.ones(2), size=7).astype(np.float32)
    edges, weights, valid = graphcut.compute_edge_weights(
        jnp.asarray(segments), 7, image=jnp.asarray(image, jnp.float32),
        features=jnp.asarray(features), proba=jnp.asarray(proba),
        edge_type=edge_type)
    w = np.asarray(weights)[np.asarray(valid)]
    assert (w > 0).all() and (w >= 1e-3 - 1e-9).all() and (w <= 1e3 + 1e-6).all()
    # padded slots carry zero weight
    assert np.asarray(weights)[~np.asarray(valid)].sum() == 0
