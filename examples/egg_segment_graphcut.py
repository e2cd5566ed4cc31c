"""Egg instance segmentation by object GraphCut around annotated centres.

Mirrors `/root/reference/notebooks/egg_segment_graphcut.ipynb`: from the
4-class tissue segmentation and egg centres, build per-object foreground
probabilities (tissue-class lookup table + radial shape prior) and solve a
multi-object MRF on superpixels, and on raw pixels for comparison.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from apps.run_center_candidate_training import load_center_annotation  # noqa: E402
from pyimsegm_tpu import region_growing as rg  # noqa: E402
from pyimsegm_tpu import superpixels  # noqa: E402
from pyimsegm_tpu.utils import data_io, data_samples, drawing  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), 'output')
BASE = os.path.join(data_samples.PATH_DATA_IMAGES, 'drosophila_ovary_slice')
NAME = 'insitu4174'
TABLE_PROB = [0.01, 0.6, 0.99, 0.75]


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    seg, _ = data_io.load_image_2d(os.path.join(BASE, 'segm', NAME + '.png'))
    img, _ = data_io.load_image_2d(os.path.join(BASE, 'image', NAME + '.jpg'))
    centres = load_center_annotation(
        os.path.join(BASE, 'center_levels', NAME + '.csv'))
    if quick:
        seg, img = seg[:400, :600], img[:400, :600]
        centres = [c for c in centres if c[0] < 390 and c[1] < 590]
    print('segm %s, %d centres' % (seg.shape, len(centres)))

    # on superpixels (`run_ovary_egg-segmentation.py:GC_slic-*`)
    slic = superpixels.segment_slic_img2d(img, sp_size=15, relative_compact=0.2)
    gc_labels = rg.object_segmentation_graphcut_slic(
        slic, seg, centres, TABLE_PROB, gc_regul=2., edge_coef=1.,
        edge_type='model', coef_shape=0.1)
    segm_slic = np.asarray(gc_labels)[slic]
    print('slic-GC objects:', np.unique(segm_slic).tolist())

    # on raw pixels (`run_ovary_egg-segmentation.py:GC_pixels-*`)
    segm_pix = rg.object_segmentation_graphcut_pixels(
        seg, centres, TABLE_PROB, gc_regul=1., seed_size=10, coef_shape=0.1)
    print('pixel-GC objects:', np.unique(np.asarray(segm_pix)).tolist())

    fig = drawing.figure_image_segm_results(img, segm_slic)
    fig.savefig(os.path.join(OUT, 'egg_gc_slic.png'), dpi=90)
    fig = drawing.figure_image_segm_results(img, np.asarray(segm_pix))
    fig.savefig(os.path.join(OUT, 'egg_gc_pixels.png'), dpi=90)
    print('wrote egg_gc_slic.png / egg_gc_pixels.png to', OUT)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
