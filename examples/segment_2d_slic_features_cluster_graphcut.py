"""Unsupervised 2D segmentation: SLIC -> features -> GMM -> GraphCut MRF.

Mirrors `/root/reference/notebooks/segment-2d_slic-fts-clust-gc.ipynb`: load a
color microscopy image, estimate a class model from superpixel features
without any annotation, and regularise the soft labelling on the superpixel
adjacency graph.
"""

import argparse
import os

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyimsegm_tpu import pipelines
from pyimsegm_tpu.utils import data_samples, drawing

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    img = data_samples.load_sample_image()
    if quick:
        img = img[:320, :512]
    print('image:', img.shape)

    segm, segm_soft = pipelines.pipe_color2d_slic_features_model_graphcut(
        img, nb_classes=4,
        dict_features={'color': ['mean', 'std', 'energy']},
        sp_size=35, sp_regul=0.2, gc_regul=2.0, gc_edge_type='model',
        estim_model='GMM')
    print('segm:', segm.shape, 'classes:', np.unique(segm).tolist())
    print('soft:', segm_soft.shape, 'sum-to-one:',
          float(np.abs(segm_soft.sum(-1) - 1).max()) < 1e-3)

    fig = drawing.figure_image_segm_results(img, segm)
    fig.savefig(os.path.join(OUT, 'unsup_segm.png'), dpi=90)
    print('wrote', os.path.join(OUT, 'unsup_segm.png'))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
