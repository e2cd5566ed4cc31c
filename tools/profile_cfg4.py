"""Stage-level attribution for BASELINE config 4 (centre-detection chain).

Times each stage of ``centers.load_compute_detect_centers`` on insitu7545:
SLIC, superpixel centres, annuli label histograms, ray features, classifier
predict, DBSCAN clustering — plus the end-to-end wall.
Run on the real chip:  python tools/profile_cfg4.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')


def _imread(path):
    from PIL import Image
    return np.asarray(Image.open(path))


def t(fn, reps=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    import jax.numpy as jnp

    from pyimsegm_tpu import centers as ctr
    from pyimsegm_tpu.ops import graph as graph_ops
    from pyimsegm_tpu.ops.histogram import compute_label_histograms_positions
    from pyimsegm_tpu.ops.ray import compute_ray_features_positions
    from pyimsegm_tpu.ops.slic import segment_slic_img2d

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    names = ['insitu4174', 'insitu4358']
    imgs = [_imread(os.path.join(base, 'image', n + '.jpg')) for n in names]
    segms = [_imread(os.path.join(base, 'segm', n + '.png')) for n in names]
    cents = [np.argwhere(_imread(os.path.join(
        base, 'center_levels', n + '.png')) > 0)[::50] for n in names]
    params = dict(ctr.CENTER_PARAMS)

    t0 = time.perf_counter()
    classif, _ = ctr.train_center_classifier(
        segms, imgs, cents, params={'nb_classif_search': 1})
    print('train setup: %.1f s' % (time.perf_counter() - t0), flush=True)

    img, segm = imgs[0], segms[0]

    ms, slic = t(lambda: np.asarray(segment_slic_img2d(
        img, sp_size=params['slic_size'],
        relative_compact=params['slic_regul'])))
    print('slic (+fetch):                 %8.2f ms' % ms, flush=True)
    k = int(slic.max()) + 1

    ms, points = t(lambda: np.asarray(
        graph_ops.superpixel_centers(jnp.asarray(slic), k)))
    print('superpixel centers (+fetch):   %8.2f ms   P=%d' % (ms, len(points)),
          flush=True)

    ms, out = t(lambda: compute_label_histograms_positions(
        np.asarray(segm), points.astype(int),
        diameters=tuple(params['fts_hist_diams'])))
    print('annuli label hists (+fetch):   %8.2f ms   F=%d'
          % (ms, np.asarray(out[0]).shape[1]), flush=True)

    ms, rays_out = t(lambda: compute_ray_features_positions(
        np.asarray(segm), points, angle_step=params['fts_ray_step'],
        edge='up', border_labels=[0], smooth_ray=0, shifting=True))
    print('ray features (+fetch):         %8.2f ms' % ms, flush=True)

    fts, _names = ctr.compute_points_features(segm, points, params)
    fts = np.nan_to_num(fts)
    ms, proba = t(lambda: classif.predict_proba(fts))
    print('classif predict_proba:         %8.2f ms' % ms, flush=True)

    cand = points[(proba[:, 1] >= 0.3)]
    ms, _ = t(lambda: ctr.cluster_center_candidates(cand, max_dist=50,
                                                    min_samples=1))
    print('dbscan cluster (%4d pts):     %8.2f ms' % (len(cand), ms),
          flush=True)

    ms, _ = t(lambda: ctr.load_compute_detect_centers(img, segm, classif))
    print('TOTAL detect chain:            %8.2f ms' % ms, flush=True)


if __name__ == '__main__':
    main()
