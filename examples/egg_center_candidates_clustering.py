"""Egg-centre detection: point features -> classifier -> DBSCAN clustering.

Mirrors `/root/reference/notebooks/egg-center_candidates-clustering.ipynb`:
train a centre classifier on annotated ovary slices (candidate points =
superpixel centres; features = annuli label histograms + ray features),
detect candidates on a held-out slice and cluster them into egg centres.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from apps.run_center_candidate_training import load_center_annotation  # noqa: E402
from pyimsegm_tpu import centers as ctr  # noqa: E402
from pyimsegm_tpu.utils import data_io, data_samples  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), 'output')
BASE = os.path.join(data_samples.PATH_DATA_IMAGES, 'drosophila_ovary_slice')


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    # train on the reference's short list, hold out the classic sample slice
    names = ['insitu4174', 'insitu4358', 'insitu7545']
    imgs, segms, centers_list = [], [], []
    for name in names:
        imgs.append(data_io.load_image_2d(
            os.path.join(BASE, 'image', name + '.jpg'))[0])
        segms.append(data_io.load_image_2d(
            os.path.join(BASE, 'segm', name + '.png'))[0])
        centers_list.append(load_center_annotation(
            os.path.join(BASE, 'center_levels', name + '.csv')))
    params = dict(ctr.CENTER_PARAMS, nb_classif_search=3)
    if quick:
        params.update(nb_classif_search=1)

    classif, _ = ctr.train_center_classifier(
        segms[:-1], imgs[:-1], centers_list[:-1], params)
    out = ctr.load_compute_detect_centers(imgs[-1], segms[-1], classif, params)
    stats = ctr.evaluate_detected_centers(out['centers'], centers_list[-1],
                                          dist_thr=params['center_dist_thr'])
    print('detected %d centres on %s' % (len(out['centers']), names[2]))
    print('precision %.2f recall %.2f f1 %.2f'
          % (stats['precision'], stats['recall'], stats['f1']))
    np.savetxt(os.path.join(OUT, 'detected_centers.csv'),
               np.asarray(out['centers']), delimiter=',', header='y,x')
    print('wrote', os.path.join(OUT, 'detected_centers.csv'))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
