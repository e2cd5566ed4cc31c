"""Wall-clock the ACTUAL reference code on the BASELINE workloads.

BASELINE.md's action item ("the reference publishes no numbers — measure the
CPU reference ourselves") applied to configs 1, 2, 4, 5 (config 3, batched
throughput, is configs-1-per-image scaled).  Prints one JSON line per
measurement and writes the set to ``tools/refrun/ref_walls.json``.

The reference runs through the same shims as ``run_reference.py``
(`USE_CYTHON=False` numpy feature paths — its own tested configuration),
single process, one CPU core, matching the recipes `bench_all.py` times on
the TPU side:

* cfg1: unsupervised color pipeline on drosophila_ovary insitu7545
* cfg2: supervised predict on drosophila_disc img_12 with the reference's
  texture family (color + tLM mean/std/energy; the reference has no
  Gabor/LBP — our cfg2 additionally measures those extra families)
* cfg4: centre-detection chain per image
  (`run_center_candidate_training.py:378` + clustering)
* cfg5: RG2Sp GraphCut per iteration
  (`region_growing.py:1482`, test recipe)

Usage::  python tools/refrun/time_reference.py [--configs 1,2,4,5]
"""

import argparse
import json
import os
import sys
import time

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
RESULTS = []


def _imread(path):
    from PIL import Image
    return np.asarray(Image.open(path))


def _emit(name, value, unit, extra=None):
    row = {'metric': name, 'value': round(float(value), 3), 'unit': unit}
    if extra:
        row.update(extra)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def time_cfg1():
    from imsegm.pipelines import pipe_color2d_slic_features_model_graphcut

    img = _imread(os.path.join(DATA, 'drosophila_ovary_slice', 'image',
                               'insitu7545.jpg')).astype(np.float64)
    np.random.seed(0)
    t0 = time.perf_counter()
    segm, _soft = pipe_color2d_slic_features_model_graphcut(
        img, 3, {'color': ['mean', 'std', 'energy']}, sp_size=35,
        sp_regul=0.2, gc_regul=2.0, gc_edge_type='model')
    dt = time.perf_counter() - t0
    mpix = img.shape[0] * img.shape[1] / 1e6
    _emit('ref_cfg1_unsup_single_image', dt * 1e3, 'ms/image',
          {'mpix_s': round(mpix / dt, 4)})


def time_cfg2():
    from imsegm.pipelines import (
        segment_color2d_slic_features_model_graphcut,
        train_classif_color2d_slic_features,
    )

    img_dir = os.path.join(DATA, 'drosophila_disc')
    feats = {'color': ['mean', 'std', 'energy'],
             'tLM': ['mean', 'std', 'energy']}
    imgs, annots = [], []
    for name in ('img_12', 'img_14', 'img_15', 'img_19'):
        ip = os.path.join(img_dir, 'image', name + '.jpg')
        ap = os.path.join(img_dir, 'annot', name + '.png')
        if os.path.isfile(ip) and os.path.isfile(ap):
            imgs.append(_imread(ip).astype(np.float64))
            annot = _imread(ap)
            if annot.ndim == 3:
                from pyimsegm_tpu.annotation import image_color_2_labels
                annot = image_color_2_labels(annot)
            annots.append(annot.astype(int))

    np.random.seed(0)
    t0 = time.perf_counter()
    classif, _s, _f, _l = train_classif_color2d_slic_features(
        imgs, annots, feats, sp_size=35, sp_regul=0.2, nb_classif_search=1,
        nb_workers=1)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    segm, _soft = segment_color2d_slic_features_model_graphcut(
        imgs[0], classif, feats, sp_size=35, sp_regul=0.2, gc_regul=5.0,
        gc_edge_type='model')
    dt = time.perf_counter() - t0
    mpix = imgs[0].shape[0] * imgs[0].shape[1] / 1e6
    _emit('ref_cfg2_supervised_predict', dt * 1e3, 'ms/image',
          {'mpix_s': round(mpix / dt, 4), 'train_s': round(t_train, 2),
           'features': 'color+tLM (reference has no Gabor/LBP)'})


def time_cfg4():
    sys.path.insert(0, os.path.join(_REFERENCE, 'experiments_ovary_centres'))
    import run_center_candidate_training as ref_train
    import run_center_clustering as ref_clust
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    from apps.run_center_candidate_training import load_center_annotation

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    params = dict(ref_train.CENTER_PARAMS)

    def _load(name):
        img = _imread(os.path.join(base, 'image', name + '.jpg')
                      ).astype(np.float64)
        segm = _imread(os.path.join(base, 'segm', name + '.png')).astype(int)
        centers = load_center_annotation(
            os.path.join(base, 'center_levels', name + '.png'))
        return img, segm, centers

    np.random.seed(0)
    all_fts, all_lbs = [], []
    for name in ('insitu4174', 'insitu4358'):
        img, segm, centers = _load(name)
        _, _slic, points, fts, _n = ref_train.estim_points_compute_features(
            name, img, segm, params)
        labels = ref_train.label_close_points(centers, points, params)
        keep = np.asarray(labels) >= 0
        all_fts.append(np.asarray(fts)[keep])
        all_lbs.append(np.asarray(labels)[keep])
    classif = Pipeline([('scaler', StandardScaler()),
                        ('clf', RandomForestClassifier(n_estimators=100,
                                                       random_state=0))])
    classif.fit(np.nan_to_num(np.concatenate(all_fts)),
                np.concatenate(all_lbs))

    img, segm, _c = _load('insitu7545')
    t0 = time.perf_counter()
    _, _slic, points, fts, _n = ref_train.estim_points_compute_features(
        'insitu7545', img, segm, params)
    pred = classif.predict(np.nan_to_num(np.asarray(fts)))
    candidates = np.asarray(points)[np.asarray(pred) == 1]
    _centers, _ = ref_clust.cluster_center_candidates(
        candidates, max_dist=50, min_samples=1)
    dt = time.perf_counter() - t0
    _emit('ref_cfg4_center_detection_per_image', dt * 1e3, 'ms/image',
          {'points': int(len(points))})


def time_cfg5():
    from run_reference import _patch_rg2sp_numpy2
    _patch_rg2sp_numpy2()
    from imsegm.region_growing import (
        compute_object_shapes,
        compute_segm_prob_fg,
        region_growing_shape_slic_graphcut,
        transform_rays_model_cdf_mixture,
    )
    from imsegm.superpixels import segment_slic_img2d

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    img = _imread(os.path.join(base, 'image', 'insitu7545.jpg')
                  ).astype(np.float64)
    seg = _imread(os.path.join(base, 'segm', 'insitu7545.png'))
    annot = _imread(os.path.join(base, 'annot_eggs', 'insitu7545.png'))
    centres = np.array([np.mean(np.argwhere(annot == lb), axis=0)
                        for lb in range(1, annot.max() + 1)])
    ann_dir = os.path.join(base, 'annot_eggs')
    annots = [_imread(os.path.join(ann_dir, f))
              for f in sorted(os.listdir(ann_dir)) if f.endswith('.png')]
    np.random.seed(0)
    list_rays, _ = compute_object_shapes(annots, ray_step=25, smooth_coef=1,
                                         interp_order='spline')
    model, cdfs = transform_rays_model_cdf_mixture(list_rays)
    slic = segment_slic_img2d(img, sp_size=15, relative_compact=0.2)
    prob_fg = compute_segm_prob_fg(slic, seg, [0.1, 0.9, 0.75, 0.9, 0.9])

    # the solver stops when labels converge, so "nb_iter high minus nb_iter
    # low" under-counts; time one full run and divide by the *actual*
    # iteration count recorded in debug_history
    history = {}
    t0 = time.perf_counter()
    region_growing_shape_slic_graphcut(
        slic, prob_fg, centres, (model, cdfs), 'cdf', coef_shape=5.,
        coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        optim_global=True, nb_iter=100, debug_history=history)
    dt = time.perf_counter() - t0
    n_iters = max(len(history.get('labels', ())), 1)
    _emit('ref_cfg5_rg2sp_gc_per_iteration', dt / n_iters * 1e3,
          'ms/iteration',
          {'objects': int(len(centres)), 'superpixels': int(slic.max() + 1),
           'iterations': int(n_iters), 'total_s': round(dt, 2)})


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--configs', default='1,2,4,5')
    args = ap.parse_args()
    cfgs = set(args.configs.split(','))
    if '1' in cfgs:
        time_cfg1()
    if '2' in cfgs:
        time_cfg2()
    if '4' in cfgs:
        time_cfg4()
    if '5' in cfgs:
        time_cfg5()
    out = os.path.join(_HERE, 'ref_walls.json')
    merged = {}
    if os.path.isfile(out):                      # merge with previous runs
        with open(out) as fh:
            for row in json.load(fh):
                merged[row['metric']] = row
    for row in RESULTS:
        merged[row['metric']] = row
    with open(out, 'w') as fh:
        json.dump(sorted(merged.values(), key=lambda r: r['metric']), fh,
                  indent=1)
    print('# wrote %s' % out, file=sys.stderr)


if __name__ == '__main__':
    main()
