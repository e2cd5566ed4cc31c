"""Region growing with a learned shape prior (RG2Sp): greedy and GraphCut.

Mirrors `/root/reference/notebooks/RG2Sp_region-growing.ipynb` and
`RG2Sp_model_region-grow.ipynb`: fit a ray-shape model from egg annotations,
then grow multi-object regions on superpixels from annotated centres, with
the shape prior steering the boundary; solve by greedy flips and by the
clamped-band MRF (GraphCut) solver.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from apps.run_center_candidate_training import load_center_annotation  # noqa: E402
from pyimsegm_tpu import region_growing as rg  # noqa: E402
from pyimsegm_tpu import superpixels  # noqa: E402
from pyimsegm_tpu.utils import data_io, data_samples, drawing, metrics  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), 'output')
BASE = os.path.join(data_samples.PATH_DATA_IMAGES, 'drosophila_ovary_slice')
NAME = 'insitu4174'
TABLE_PROB = [0.01, 0.6, 0.95, 0.75]
RG2SP_THRESHOLDS = rg.RG2SP_THRESHOLDS


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    # shape model from all annotated eggs
    annots = [np.asarray(data_io.load_image_2d(p)[0]).astype(int)
              for p in sorted(glob.glob(os.path.join(BASE, 'annot_eggs',
                                                     '*.png')))]
    list_rays, _ = rg.compute_object_shapes(annots, ray_step=10,
                                            interp_order='spline',
                                            smooth_coef=1)
    rays_arr = np.asarray(list_rays, float)
    ok = np.all(np.isfinite(rays_arr), axis=1) & np.all(rays_arr > 0, axis=1)
    mixture, cdf = rg.transform_rays_model_cdf_mixture(rays_arr[ok].tolist())
    shape_model = (mixture, cdf)
    print('shape model over %d eggs' % int(ok.sum()))

    seg, _ = data_io.load_image_2d(os.path.join(BASE, 'segm', NAME + '.png'))
    img, _ = data_io.load_image_2d(os.path.join(BASE, 'image', NAME + '.jpg'))
    annot, _ = data_io.load_image_2d(
        os.path.join(BASE, 'annot_eggs', NAME + '.png'))
    centres = load_center_annotation(
        os.path.join(BASE, 'center_levels', NAME + '.csv'))
    if quick:
        seg, img, annot = seg[:400, :600], img[:400, :600], annot[:400, :600]
        centres = [c for c in centres if c[0] < 390 and c[1] < 590]

    slic = superpixels.segment_slic_img2d(img, sp_size=15, relative_compact=0.2)
    prob_fg = rg.compute_segm_prob_fg(slic, seg, TABLE_PROB)

    for solver, fn, nb_iter in (
            ('greedy', rg.region_growing_shape_slic_greedy, 100),
            ('graphcut', rg.region_growing_shape_slic_graphcut, 50)):
        labels = fn(slic, prob_fg, centres, shape_model, shape_type='cdf',
                    coef_shape=2., coef_pairwise=5.,
                    prob_label_trans=(0.1, 0.03), allow_obj_swap=True,
                    dict_thresholds=RG2SP_THRESHOLDS,
                    nb_iter=min(30, nb_iter) if quick else nb_iter)
        segm_obj = np.asarray(labels)[slic]
        ars = metrics.adjusted_rand_score(segm_obj, np.asarray(annot))
        print('RG2Sp %-8s: %d objects, ARS vs egg annotation %.3f'
              % (solver, len(np.unique(segm_obj)) - 1, ars))
        fig = drawing.figure_image_segm_results(img, segm_obj)
        fig.savefig(os.path.join(OUT, 'rg2sp_%s.png' % solver), dpi=90)
    print('wrote rg2sp_greedy.png / rg2sp_graphcut.png to', OUT)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
