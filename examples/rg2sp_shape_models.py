"""RG2Sp ray-shape models: single CDF table and mixture of CDF sets.

Mirrors `/root/reference/notebooks/RG2Sp_shape-models.ipynb`: collect ray
signatures of every annotated egg, fit (a) one blended inverse-CDF table via
a Bayesian mixture over rays and (b) a mixture of per-cluster mean CDF sets,
and visualise the resulting shape priors.
"""

import argparse
import glob
import os
import pickle

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyimsegm_tpu import region_growing as rg
from pyimsegm_tpu.utils import data_io, data_samples

OUT = os.path.join(os.path.dirname(__file__), 'output')
DIR_ANNOT = os.path.join(data_samples.PATH_DATA_IMAGES,
                         'drosophila_ovary_slice', 'annot_eggs')


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(DIR_ANNOT, '*.png')))
    if quick:
        paths = paths[:3]
    annots = [np.asarray(data_io.load_image_2d(p)[0]).astype(int)
              for p in paths]
    list_rays, list_shifts = rg.compute_object_shapes(
        annots, ray_step=10, interp_order='spline', smooth_coef=1)
    rays_arr = np.asarray(list_rays, float)
    ok = np.all(np.isfinite(rays_arr), axis=1) & np.all(rays_arr > 0, axis=1)
    list_rays = rays_arr[ok].tolist()
    print('collected %d egg ray signatures (%d angles each)'
          % (len(list_rays), len(list_rays[0])))

    model_single, cdf = rg.transform_rays_model_cdf_mixture(list_rays)
    print('single model: CDF table %s' % (np.asarray(cdf).shape,))

    model_mix, mean_cdf = rg.transform_rays_model_sets_mean_cdf_mixture(
        list_rays, nb_components=2)
    print('mixture model: %d component CDF sets' % len(mean_cdf))

    with open(os.path.join(OUT, 'shape_model_single.pkl'), 'wb') as fp:
        pickle.dump({'name': 'cdf', 'cdfs': cdf, 'model': model_single}, fp)
    with open(os.path.join(OUT, 'shape_model_mixture.pkl'), 'wb') as fp:
        pickle.dump({'name': 'set_cdfs', 'cdfs': mean_cdf,
                     'model': model_mix}, fp)
    print('wrote shape_model_{single,mixture}.pkl to', OUT)

    # prior probability of a boundary point at (angle=0, distance d)
    chist = np.asarray(cdf)
    for d in (10, 40, 70):
        p = rg.compute_shape_prior_table_cdf([0, d], chist, (0, 0))
        print('P(border beyond %3d px at angle 0) = %.3f' % (d, float(p)))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
