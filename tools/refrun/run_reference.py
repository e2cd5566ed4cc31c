"""Execute the ACTUAL reference code (`/root/reference/imsegm`) on the
bundled sample data and export its label maps + fitted models, so the TPU
framework can be scored directly against reference outputs (not only
against its own CPU backend).

The reference's third-party stack (scikit-image, pyGCO, olefile, nibabel)
is not installed here; `tools/refrun/shims/` supplies from-scratch numpy
stand-ins for exactly the surface the reference touches (see shims'
module docstrings), and `refcompat.install()` restores legacy
numpy/scipy/pandas APIs the 2021-era reference expects.  The reference's
*own* Python code runs unmodified, with its numpy feature paths
(``USE_CYTHON=False`` is the reference's tested configuration — its own
test-suite and production scripts disable Cython too,
`/root/reference/tests/test_pipelines.py:38`,
`/root/reference/experiments_segmentation/run_segm_slic_model_graphcut.py:58`).

Usage::

    python tools/refrun/run_reference.py unsup [--out DIR]
    python tools/refrun/run_reference.py sup   [--out DIR]
    python tools/refrun/run_reference.py rg2sp [--out DIR]

Outputs one ``.npz`` per image under DIR (default ``tools/refrun/out``):
``segm`` (final labels), ``slic`` (superpixels), and for ``unsup`` the
fitted sklearn model parameters (scaler mean/scale, GMM weights/means/
covariances) for shared-model replay through the TPU pipeline.
"""

import argparse
import os
import sys

# The gco shim resolves to pyimsegm_tpu's native C++ alpha-expansion; that
# package imports jax at package-init.  Pin jax to the host CPU before any
# import so the reference run can never touch (or hang on) the TPU tunnel.
# Hard override: the session environment pre-sets JAX_PLATFORMS to the
# accelerator platform, so setdefault would silently keep the TPU.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('MPLBACKEND', 'Agg')

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_REFERENCE = os.environ.get('PYIMSEGM_REFERENCE_PATH', '/root/reference')
sys.path.insert(0, os.path.join(_HERE, 'shims'))
sys.path.insert(0, _REFERENCE)
sys.path.insert(0, _REPO)

import refcompat

refcompat.install()

import numpy as np  # noqa: E402

DATA = os.environ.get('PYIMSEGM_DATA_PATH',
                      os.path.join(_REFERENCE, 'data-images'))

# the same config tools/check_parity.py measures (reference SEGM_PARAMS
# family: slic_size 35, slic_regul 0.2, gc_regul 2.0, edge 'model')
UNSUP_IMAGES = (
    ('drosophila_ovary_slice', os.path.join(
        DATA, 'drosophila_ovary_slice', 'image', 'insitu7545.jpg')),
    ('langerhans_islets', os.path.join(
        DATA, 'langerhans_islets', 'image', 'Lh05-04.jpg')),
    ('histology_CIMA', os.path.join(
        DATA, 'histology_CIMA', '29-041-Izd2-w35-CD31-3-les1.jpg')),
)
SP_SIZE, SP_REGUL, GC_REGUL, NB_CLASSES = 35, 0.2, 2.0, 3
FEATS = {'color': ['mean', 'std', 'energy']}

SUP_NAMES = ('insitu4174', 'insitu4358', 'insitu7331', 'insitu7544',
             'insitu7545')


def _imread(path):
    from PIL import Image
    return np.asarray(Image.open(path))


def _imread_f64(path):
    """Images are fed to the reference as float64 so its *numpy* feature
    fallback matches its *Cython* kernels: `descriptors.py:410` squares the
    raw array in-place for the energy feature, which silently overflows
    modulo 256 on uint8 inputs, whereas the primary Cython path casts to
    float32 first (`descriptors.py:261`).  Casting up front gives the
    reference its intended (Cython) numerics without touching its code."""
    return _imread(path).astype(np.float64)


def _export_model(model):
    """Flatten the sklearn Pipeline([std_scaler?, model=GMM]) to arrays."""
    out = {}
    steps = dict(model.named_steps)
    if 'std_scaler' in steps:
        out['scaler_mean'] = np.asarray(steps['std_scaler'].mean_, np.float64)
        out['scaler_scale'] = np.asarray(steps['std_scaler'].scale_, np.float64)
    mm = steps['model']
    out['gmm_weights'] = np.asarray(mm.weights_, np.float64)
    out['gmm_means'] = np.asarray(mm.means_, np.float64)
    out['gmm_covs'] = np.asarray(mm.covariances_, np.float64)
    return out


def run_unsup(out_dir):
    """Reference unsupervised pipeline, stepped so the fitted model is
    captured (mirrors `imsegm/pipelines.py:46-110` exactly)."""
    from imsegm.graph_cuts import estim_class_model, segment_graph_cut_general
    from imsegm.pipelines import compute_color2d_superpixels_features

    for name, path in UNSUP_IMAGES:
        if not os.path.isfile(path):
            print('skip (missing): %s' % path)
            continue
        image = _imread_f64(path)
        np.random.seed(0)
        slic, features = compute_color2d_superpixels_features(
            image, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL)
        model = estim_class_model(features, NB_CLASSES, 'GMM')
        proba = model.predict_proba(features)
        graph_labels = segment_graph_cut_general(
            slic, proba, image, features, GC_REGUL, 'model')
        segm = graph_labels[slic]
        payload = dict(segm=segm.astype(np.int32), slic=slic.astype(np.int32),
                       segm_argmax=np.argmax(proba, axis=1)[slic].astype(np.int32),
                       features=features.astype(np.float32),
                       image_path=np.array(path), **_export_model(model))
        out = os.path.join(out_dir, 'unsup_%s.npz' % name)
        np.savez_compressed(out, **payload)
        print('wrote %s  (%d superpixels, %d classes)'
              % (out, slic.max() + 1, NB_CLASSES))


def run_sup(out_dir):
    """Reference supervised pipeline on the ovary structure annotations
    (mirrors `imsegm/pipelines.py:293-380` + prediction per train image)."""
    from imsegm.pipelines import (
        segment_color2d_slic_features_model_graphcut,
        train_classif_color2d_slic_features,
    )

    img_dir = os.path.join(DATA, 'drosophila_ovary_slice', 'image')
    ann_dir = os.path.join(DATA, 'drosophila_ovary_slice', 'annot_struct')
    images, annots, names = [], [], []
    for name in SUP_NAMES:
        ip = os.path.join(img_dir, name + '.jpg')
        ap = os.path.join(ann_dir, name + '.png')
        if os.path.isfile(ip) and os.path.isfile(ap):
            images.append(_imread_f64(ip))
            annots.append(_imread(ap))
            names.append(name)
    if not images:
        raise FileNotFoundError('no supervised pairs under %r' % img_dir)

    np.random.seed(0)
    classif, _list_slic, _list_fts, _list_lbs = \
        train_classif_color2d_slic_features(
            images, annots, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            nb_workers=1)
    for name, image in zip(names, images):
        segm, segm_soft = segment_color2d_slic_features_model_graphcut(
            image, classif, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model')
        out = os.path.join(out_dir, 'sup_%s.npz' % name)
        np.savez_compressed(out, segm=np.asarray(segm, np.int32),
                            proba_max=segm_soft.max(axis=-1))
        print('wrote %s' % out)


def _patch_rg2sp_numpy2():
    """numpy >= 1.24 refuses the ragged ``np.array(slic_neighbours)`` in
    `imsegm/region_growing.py:1104`; re-install the function with
    ``dtype=object`` added — behaviour is otherwise identical (legacy numpy
    auto-created the object array)."""
    import numpy as _np

    import imsegm.region_growing as _rg

    def get_neighboring_candidates(slic_neighbours, labels, object_idx,
                                   use_other_obj=True):
        neighbours = []
        ragged = _np.empty(len(slic_neighbours), dtype=object)
        ragged[:] = slic_neighbours
        for l_idx in ragged[_np.asarray(labels) == object_idx]:
            neighbours += list(l_idx)
        neighbours = _np.unique(neighbours)
        if use_other_obj:
            neighbours = [lb for lb in neighbours if labels[lb] != object_idx]
        else:
            neighbours = [lb for lb in neighbours if labels[lb] == 0]
        return neighbours

    _rg.get_neighboring_candidates = get_neighboring_candidates


def run_rg2sp(out_dir):
    """Reference RG2Sp (both solvers) on insitu7545, following the
    reference's own test recipe (`/root/reference/tests/test_region-growing.py`)."""
    _patch_rg2sp_numpy2()
    from imsegm.region_growing import (
        compute_object_shapes,
        compute_segm_prob_fg,
        region_growing_shape_slic_graphcut,
        region_growing_shape_slic_greedy,
        transform_rays_model_sets_mean_cdf_mixture,
    )
    from imsegm.superpixels import segment_slic_img2d

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    img = _imread_f64(os.path.join(base, 'image', 'insitu7545.jpg'))
    seg = _imread(os.path.join(base, 'segm', 'insitu7545.png'))
    annot = _imread(os.path.join(base, 'annot_eggs', 'insitu7545.png'))
    centers = np.array([
        np.mean(np.argwhere(annot == lb), axis=0)
        for lb in range(1, annot.max() + 1)
    ])

    np.random.seed(0)
    # shape model from the per-egg annotations of all bundled slices
    list_annots = []
    ann_dir = os.path.join(base, 'annot_eggs')
    for fname in sorted(os.listdir(ann_dir)):
        if fname.endswith('.png'):
            list_annots.append(_imread(os.path.join(ann_dir, fname)))
    list_rays, _ = compute_object_shapes(list_annots, ray_step=25,
                                         smooth_coef=1, interp_order='spline')
    model, list_mean_cdf = transform_rays_model_sets_mean_cdf_mixture(
        list_rays, 2)

    slic = segment_slic_img2d(img, sp_size=15, relative_compact=0.2)
    slic_prob_fg = compute_segm_prob_fg(slic, seg, [0.1, 0.9, 0.75, 0.9, 0.9])

    # parameters follow the reference's own test
    # (`/root/reference/tests/test_region-growing.py:135-201`)
    dict_debug = None
    labels_greedy = region_growing_shape_slic_greedy(
        slic, slic_prob_fg, centers, (model, list_mean_cdf), 'set_cdfs',
        coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        greedy_tol=3e-1, allow_obj_swap=False, dict_thresholds=None,
        nb_iter=250, debug_history=dict_debug)
    print('greedy done: %d objects' % labels_greedy.max())
    labels_gc = region_growing_shape_slic_graphcut(
        slic, slic_prob_fg, centers, (model, list_mean_cdf), 'set_cdfs',
        coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        optim_global=False, allow_obj_swap=False, dict_thresholds=None,
        nb_iter=65, debug_history=dict_debug)
    print('graphcut done: %d objects' % labels_gc.max())
    out = os.path.join(out_dir, 'rg2sp_insitu7545.npz')
    payload = dict(
        slic=slic.astype(np.int32),
        segm_greedy=np.asarray(labels_greedy)[slic].astype(np.int32),
        segm_gc=np.asarray(labels_gc)[slic].astype(np.int32),
        annot=annot.astype(np.int32),
        # the fitted shape mixture (sklearn BayesianGaussianMixture, diag)
        # + per-component (mean, survival-table) sets, for shared-model
        # replay through the TPU solvers
        model_weights=np.asarray(model.weights_, np.float64),
        model_means=np.asarray(model.means_, np.float64),
        model_covs=np.asarray(model.covariances_, np.float64),
        n_components=np.int32(len(list_mean_cdf)))
    for j, (mean, cdf) in enumerate(list_mean_cdf):
        payload['cdf_mean_%d' % j] = np.asarray(mean, np.float64)
        payload['cdf_table_%d' % j] = np.asarray(cdf, np.float64)
    np.savez_compressed(out, **payload)
    print('wrote %s' % out)


def run_centers(out_dir):
    """Reference egg-centre detection chain: superpixel candidate points ->
    annuli label histograms + ray features -> RandForest -> DBSCAN
    (`experiments_ovary_centres/run_center_candidate_training.py:378-737`
    compute core; the file-IO/visual wrappers are bypassed)."""
    sys.path.insert(0, os.path.join(_REFERENCE, 'experiments_ovary_centres'))
    import run_center_candidate_training as ref_train
    import run_center_clustering as ref_clust
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.preprocessing import StandardScaler
    from sklearn.pipeline import Pipeline

    from apps.run_center_candidate_training import load_center_annotation

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    params = dict(ref_train.CENTER_PARAMS)
    train_names = ['insitu4174', 'insitu4358']
    test_names = ['insitu7331', 'insitu7544', 'insitu7545']

    def _load(name):
        img = _imread_f64(os.path.join(base, 'image', name + '.jpg'))
        segm = _imread(os.path.join(base, 'segm', name + '.png')).astype(int)
        centers = load_center_annotation(
            os.path.join(base, 'center_levels', name + '.png'))
        return img, segm, centers

    np.random.seed(0)
    all_fts, all_lbs = [], []
    for name in train_names:
        img, segm, centers = _load(name)
        _, _slic, points, fts, _names = ref_train.estim_points_compute_features(
            name, img, segm, params)
        labels = ref_train.label_close_points(centers, points, params)
        keep = np.asarray(labels) >= 0
        all_fts.append(np.asarray(fts)[keep])
        all_lbs.append(np.asarray(labels)[keep])
    x = np.nan_to_num(np.concatenate(all_fts))
    y = np.concatenate(all_lbs)
    classif = Pipeline([('scaler', StandardScaler()),
                        ('clf', RandomForestClassifier(n_estimators=100,
                                                       random_state=0))])
    classif.fit(x, y)

    for name in test_names:
        img, segm, centers_gt = _load(name)
        _, _slic, points, fts, _names = ref_train.estim_points_compute_features(
            name, img, segm, params)
        pred = classif.predict(np.nan_to_num(np.asarray(fts)))
        candidates = np.asarray(points)[np.asarray(pred) == 1]
        centers_det, _ = ref_clust.cluster_center_candidates(
            candidates, max_dist=50, min_samples=1)
        out = os.path.join(out_dir, 'centers_%s.npz' % name)
        np.savez_compressed(out,
                            centers_detected=np.asarray(centers_det, float),
                            centers_true=np.asarray(centers_gt, float))
        print('wrote %s  (%d detected / %d true)'
              % (out, len(centers_det), len(centers_gt)))


def run_gray3d(out_dir):
    """Reference 3D gray pipeline (`imsegm/pipelines.py:382-431`) on the
    synthetic structured volume its own doctest uses (scaled up, with
    anisotropic spacing)."""
    from imsegm.pipelines import pipe_gray3d_slic_features_model_graphcut

    np.random.seed(0)
    vol = np.random.random((8, 128, 160)) / 2.0
    vol[:, :, :80] += 0.5
    np.random.seed(0)
    segm = pipe_gray3d_slic_features_model_graphcut(
        vol, 2, {'color': ['mean', 'std', 'energy']}, spacing=(4, 1, 1),
        sp_size=15, sp_regul=0.2, gc_regul=0.1)
    out = os.path.join(out_dir, 'gray3d_synthetic.npz')
    np.savez_compressed(out, segm=np.asarray(segm, np.int32),
                        vol=vol.astype(np.float32))
    print('wrote %s  (classes %d)' % (out, segm.max() + 1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('mode', choices=('unsup', 'sup', 'rg2sp', 'centers',
                                     'gray3d', 'all'))
    ap.add_argument('--out', default=os.path.join(_HERE, 'out'))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.mode in ('unsup', 'all'):
        run_unsup(args.out)
    if args.mode in ('sup', 'all'):
        run_sup(args.out)
    if args.mode in ('rg2sp', 'all'):
        run_rg2sp(args.out)
    if args.mode in ('centers', 'all'):
        run_centers(args.out)
    if args.mode in ('gray3d', 'all'):
        run_gray3d(args.out)


if __name__ == '__main__':
    main()
