"""Supervised 2D segmentation: train a classifier on annotated images.

Mirrors `/root/reference/notebooks/segment-2d_slic-fts-classif-gc.ipynb`:
superpixel features are labelled from the annotation by majority overlap
(purity-filtered), a classifier is trained with cross-validated search, and
a held-out image is segmented with GraphCut regularisation.
"""

import argparse
import glob
import os

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyimsegm_tpu import pipelines
from pyimsegm_tpu.utils import data_io, data_samples, drawing, metrics

OUT = os.path.join(os.path.dirname(__file__), 'output')
DIR_IMG = os.path.join(data_samples.PATH_DATA_IMAGES,
                       'drosophila_ovary_slice', 'image')
DIR_ANNOT = os.path.join(data_samples.PATH_DATA_IMAGES,
                         'drosophila_ovary_slice', 'annot_struct')


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(DIR_IMG, '*.jpg')))[:3]
    crop = ((slice(160, 480), slice(256, 768)) if quick
            else (slice(None),) * 2)
    imgs, annots = [], []
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        imgs.append(data_io.load_image_2d(p)[0][crop])
        annots.append(data_io.load_image_2d(
            os.path.join(DIR_ANNOT, name + '.png'))[0][crop])
    print('training on %d images %s' % (len(imgs) - 1, imgs[0].shape))

    feats = {'color': ['mean', 'std', 'energy']}
    classif, _slics, _feats, _labels = pipelines.train_classif_color2d_slic_features(
        imgs[:-1], annots[:-1], feats, sp_size=25, sp_regul=0.2,
        clf_name='RandForest', nb_classif_search=3)

    segm, segm_soft = pipelines.segment_color2d_slic_features_model_graphcut(
        imgs[-1], classif, feats, sp_size=25, sp_regul=0.2, gc_regul=2.0,
        gc_edge_type='model')
    ars = metrics.adjusted_rand_score(segm, annots[-1])
    print('held-out ARS vs annotation: %.3f' % ars)

    fig = drawing.figure_image_segm_results(imgs[-1], segm)
    fig.savefig(os.path.join(OUT, 'sup_segm.png'), dpi=90)
    print('wrote', os.path.join(OUT, 'sup_segm.png'))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
