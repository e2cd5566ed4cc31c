"""3D gray-volume pipeline (`pipe_gray3d_slic_features_model_graphcut`)."""

import numpy as np

from pyimsegm_tpu import pipelines
from pyimsegm_tpu.ops.slic3d import segment_slic_img3d_gray
import pytest

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


def test_slic3d_segments_volume(rng):
    vol = rng.random((8, 32, 48)).astype(np.float32)
    labels = segment_slic_img3d_gray(vol, sp_size=8, relative_compact=0.3,
                                     space=(2, 1, 1))
    assert labels.shape == vol.shape
    assert labels.max() > 4


def test_pipe_gray3d_two_phase(rng):
    # two-phase volume along width
    vol = np.zeros((6, 24, 36), np.float32)
    vol[:, :, 18:] = 1.0
    vol += rng.normal(0, 0.05, vol.shape).astype(np.float32)
    segm = pipelines.pipe_gray3d_slic_features_model_graphcut(
        vol, nb_classes=2, dict_features={'color': ['mean']},
        spacing=(2, 1, 1), sp_size=6, sp_regul=0.2, gc_regul=0.1)
    assert segm.shape == vol.shape
    left = segm[:, :, :14]
    right = segm[:, :, 22:]
    # each side dominated by a single (different) class
    lab_l = np.bincount(left.ravel()).argmax()
    lab_r = np.bincount(right.ravel()).argmax()
    assert lab_l != lab_r
    assert np.mean(left == lab_l) > 0.9
    assert np.mean(right == lab_r) > 0.9


def test_grid3d_solver_matches_edge_list_solver():
    """solve_mrf_grid3d must reproduce the edge-list solve_mrf labels on the
    same graph (identical message structure, same mean-field+ICM schedule)."""
    import jax.numpy as jnp
    import numpy as np

    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.graphcut import compute_pairwise_cost, solve_mrf
    from pyimsegm_tpu.ops import graph as graph_ops
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(0)
    vol = rng.random((8, 40, 48), dtype=np.float32) / 2.0
    vol[:, :, :24] += 0.5
    cfg = slic3d.slic3d_config(vol.shape, 8, (2, 1, 1))
    m = compactness_from_regul(8, 0.2)
    labels = slic3d.slic3d_segment(jnp.asarray(vol), cfg, m)
    k = cfg.n_segments
    edges, valid = graph_ops.adjacency_edges_3d(labels, k)
    weights = jnp.where(valid, rng.random(len(valid)).astype(np.float32), 0.0)
    unary = jnp.asarray(rng.random((k, 2), np.float32) * 3.0)
    pw = jnp.asarray(compute_pairwise_cost(0.5, 2), jnp.float32)

    ref = np.asarray(solve_mrf(unary, edges, weights, pw))
    wgrid = slic3d.wgrid3d_from_edges(edges, valid, weights, cfg)
    out = np.asarray(slic3d.solve_mrf_grid3d(unary, wgrid, pw, cfg))
    assert (ref == out).mean() > 0.99


def test_grid3d_lookup_matches_gather():
    import jax.numpy as jnp
    import numpy as np

    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(1)
    vol = rng.random((6, 32, 40), dtype=np.float32)
    cfg = slic3d.slic3d_config(vol.shape, 8, (2, 1, 1))
    m = compactness_from_regul(8, 0.2)
    labels = slic3d.slic3d_segment(jnp.asarray(vol), cfg, m)
    table = jnp.asarray(rng.random((cfg.n_segments, 3), np.float32))
    ref = np.asarray(table)[np.asarray(labels)]
    out = np.asarray(slic3d.grid3d_lookup(table, labels, cfg))
    assert np.allclose(out, ref, atol=1e-6)
