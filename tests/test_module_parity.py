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


REF_MODULES = {
    'superpixels.py': 'pyimsegm_tpu.superpixels',
    'descriptors.py': 'pyimsegm_tpu.descriptors',
    'graph_cuts.py': 'pyimsegm_tpu.graph_cuts',
    'classification.py': 'pyimsegm_tpu.classification',
    'pipelines.py': 'pyimsegm_tpu.pipelines',
    'labeling.py': 'pyimsegm_tpu.labeling',
    'region_growing.py': 'pyimsegm_tpu.region_growing',
    'ellipse_fitting.py': 'pyimsegm_tpu.ellipse_fitting',
    'annotation.py': 'pyimsegm_tpu.annotation',
    'utilities/data_io.py': 'pyimsegm_tpu.utils.data_io',
    'utilities/experiments.py': 'pyimsegm_tpu.utils.experiments',
    'utilities/drawing.py': 'pyimsegm_tpu.utils.drawing',
    'utilities/data_samples.py': 'pyimsegm_tpu.utils.data_samples',
    'utilities/read_zvi.py': 'pyimsegm_tpu.utils.read_zvi',
}


@pytest.mark.skipif(not __import__('os').path.isdir('/root/reference/imsegm'),
                    reason='reference checkout not mounted')
def test_full_public_symbol_parity():
    """Every public function/class of each reference module has a same-named
    counterpart importable from the corresponding pyimsegm_tpu module."""
    import ast
    import importlib
    import os
    for ref_rel, our_mod in REF_MODULES.items():
        path = os.path.join('/root/reference/imsegm', ref_rel)
        tree = ast.parse(open(path).read())
        ref_names = {n.name for n in tree.body
                     if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                     and not n.name.startswith('_')}
        ours = set(dir(importlib.import_module(our_mod)))
        missing = sorted(ref_names - ours)
        assert not missing, '%s missing: %s' % (ref_rel, missing)


def test_descriptor_twins_numpy_vs_device():
    rng = np.random.default_rng(0)
    from pyimsegm_tpu import descriptors as ds
    img = rng.random((24, 30, 3))
    seg = rng.integers(0, 5, size=(24, 30))
    for np_fn, dev_fn in [
        (ds.numpy_img2d_color_mean, ds.cython_img2d_color_mean),
        (ds.numpy_img2d_color_energy, ds.cython_img2d_color_energy),
        (ds.numpy_img2d_color_std, ds.cython_img2d_color_std),
    ]:
        assert np.allclose(np_fn(img, seg), dev_fn(img, seg), atol=1e-4)
    vol = rng.random((4, 12, 15))
    seg3 = rng.integers(0, 5, size=(4, 12, 15))
    for np_fn, dev_fn in [
        (ds.numpy_img3d_gray_mean, ds.cython_img3d_gray_mean),
        (ds.numpy_img3d_gray_energy, ds.cython_img3d_gray_energy),
        (ds.numpy_img3d_gray_std, ds.cython_img3d_gray_std),
    ]:
        assert np.allclose(np_fn(vol, seg3), dev_fn(vol, seg3), atol=1e-4)


def test_ray_twins_numpy_vs_device():
    from pyimsegm_tpu import descriptors as ds
    seg = np.ones((100, 150), dtype=bool)
    yy, xx = np.mgrid[:100, :150]
    seg[((yy - 50) ** 2 + (xx - 75) ** 2) <= 40 ** 2] = False
    host = ds.numpy_ray_features_seg2d(seg, (50, 75), 45)
    dev = ds.cython_ray_features_seg2d(seg, (50, 75), 45)
    assert np.all(np.abs(host - dev) <= 1.5)
    # empty segmentation -> all -1
    host0 = ds.numpy_ray_features_seg2d(np.zeros((50, 60), bool), (25, 30), 90)
    assert host0.tolist() == [-1.0] * 4


def test_statistic_dispatchers_match_reference_shapes():
    rng = np.random.default_rng(1)
    from pyimsegm_tpu import descriptors as ds
    img = rng.random((20, 25, 3))
    seg = rng.integers(0, 4, size=(20, 25))
    feats, names = ds.compute_image2d_color_statistic(img, seg,
                                                      ('mean', 'std'))
    assert feats.shape == (4, 6) and len(names) == 6
    assert names[0] == 'color-ch1_mean'
    ref_mean = ds.numpy_img2d_color_mean(img, seg)
    assert np.allclose(feats[:, :3], ref_mean, atol=1e-4)
    vol = rng.random((3, 12, 14))
    seg3 = rng.integers(0, 4, size=(3, 12, 14))
    feats3, names3 = ds.compute_image3d_gray_statistic(vol, seg3,
                                                       ('mean', 'energy'))
    assert feats3.shape == (4, 2) and names3 == ['gray_mean', 'gray_energy']
    assert np.allclose(feats3[:, 0], ds.numpy_img3d_gray_mean(vol, seg3),
                       atol=1e-4)


def test_filter_response_and_edge_model():
    rng = np.random.default_rng(2)
    from pyimsegm_tpu import descriptors as ds
    from pyimsegm_tpu import graph_cuts as gc
    img = rng.random((20, 20))
    bank = ds.create_filter_bank_lm_2d(radius=4, nb_orient=4)
    resp = ds.compute_img_filter_response2d(img, bank.kernels[:2])
    assert resp.shape == img.shape
    vol = rng.random((2, 10, 10))
    resp3 = ds.compute_img_filter_response3d(vol, bank.kernels[:2])
    assert resp3.shape == vol.shape
    sub = ds.image_subtract_gauss_smooth(vol, 3.0)
    assert sub.shape == vol.shape and abs(sub.mean()) < abs(vol.mean())
    proba = np.array([[0.9, 0.1], [0.85, 0.15], [0.1, 0.9]])
    edges = np.array([[0, 1], [1, 2]])
    for metric in ('l1', 'l2', 'lT'):
        w = gc.compute_edge_model(edges, proba, metric)
        assert w.shape == (2,) and w[0] > w[1]


def test_estim_class_model_gmm_kmeans_parity():
    rng = np.random.default_rng(3)
    from pyimsegm_tpu import graph_cuts as gc
    fts = np.vstack([rng.random((60, 3)) - 1, rng.random((60, 3)) + 1])
    mm = gc.estim_class_model_gmm(fts, 2)
    proba = np.asarray(mm.predict_proba(fts))
    assert proba.shape == (120, 2)
    hard = proba.argmax(1)
    assert len(set(hard[:60])) == 1 and hard[0] != hard[-1]
    mm2, y = gc.estim_class_model_kmeans(fts, 2, max_iter=9)
    assert y.shape == (120,)
    assert np.asarray(mm2.predict_proba(fts)).shape == (120, 2)


def test_classif_search_objects():
    rng = np.random.default_rng(4)
    from pyimsegm_tpu import classification as clf
    x = np.vstack([rng.normal(0, 1, (40, 4)), rng.normal(3, 1, (40, 4))])
    y = np.array([0] * 40 + [1] * 40)
    search = clf.create_classif_search('KNN', nb_iter=2, cross_val=4)
    search.fit(x, y)
    assert search.best_estimator_ is not None
    assert search.best_score_ > 0.8
    assert clf.relabel_sequential([0, 0, 5, 5, 0]) == [0, 0, 1, 1, 0]
    assert len(clf.unique_rows(np.array([[1, 2], [1, 2], [3, 4]]))) == 2
    fx, fy = clf.shuffle_features_labels(x, y, rand_seed=0)
    assert sorted(fy.tolist()) == sorted(y.tolist())
    d = clf.compose_dict_label_features(x, y)
    x2, y2 = clf.convert_dict_label_features_2_vectors(d)
    assert x2.shape == x.shape
    assert clf.search_params_cut_down_max_nb_iter({'a': [1, 2]}, 9) == 2


def test_pipelines_wrapper_compute():
    rng = np.random.default_rng(5)
    from pyimsegm_tpu import pipelines
    annot = np.zeros((64, 64), int)
    annot[:, 32:] = 1
    img = np.stack([annot * 0.8 + rng.random((64, 64)) * 0.1] * 3, axis=-1)
    slic, feats, lbs = pipelines.wrapper_compute_color2d_slic_features_labels(
        (img, annot), sp_size=16, sp_regul=0.2,
        dict_features={'color': ('mean',)})
    assert slic.shape == (64, 64)
    assert feats.shape[0] == lbs.shape[0]
    valid = lbs[lbs >= 0]
    assert len(valid) and set(valid.tolist()) <= {0, 1}
