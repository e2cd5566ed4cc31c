"""Estimate RG2Sp ray-shape models (single + mixture) from egg annotations.

Counterpart of
`/root/reference/experiments_ovary_detect/run_RG2Sp_estim_shape-models.py`:
collects per-egg ray signatures over all annotated images, fits the single
CDF-table model and the mixture set model, and exports them as pkl/npz.

Example::

    python apps/run_RG2Sp_estim_shape_models.py \
        --path_annot '/root/reference/data-images/drosophila_ovary_slice/annot_eggs/*.png' \
        --path_out ./results
"""

import argparse
import glob
import logging
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps import common  # noqa: E402
from pyimsegm_tpu import region_growing as rg  # noqa: E402
from pyimsegm_tpu.utils import data_io  # noqa: E402

NAME_SINGLE = 'RG2SP_eggs_single-model.pkl'
NAME_MIXTURE = 'RG2SP_eggs_mixture-model.pkl'
NAME_NPZ = 'RG2SP_eggs_rays.npz'


def arg_parse_params():
    parser = argparse.ArgumentParser()
    common.add_path_arg(parser, 'path_annot', '', 'egg annotation pattern',
                        required=True)
    common.add_path_arg(parser, 'path_out', './results', 'output directory')
    parser.add_argument('--ray_step', type=int, default=10)
    parser.add_argument('--nb_components', type=int, default=2)
    return common.parse_arg_params(parser, {})


def main(params):
    paths = sorted(glob.glob(params['path_annot']))
    logging.info('found %i annotations', len(paths))
    annots = [np.asarray(data_io.load_image_2d(p)[0]).astype(int)
              for p in paths]
    list_rays, list_shifts = rg.compute_object_shapes(
        annots, ray_step=params['ray_step'], interp_order='spline',
        smooth_coef=1)
    # drop degenerate shapes (tiny fragments with unresolved ray hits)
    rays_arr = np.asarray(list_rays, float)
    ok = np.all(np.isfinite(rays_arr), axis=1) & np.all(rays_arr > 0, axis=1)
    list_rays = rays_arr[ok].tolist()
    list_shifts = np.asarray(list_shifts)[ok].tolist()
    logging.info('collected %i egg shapes (%i dropped)', len(list_rays),
                 int(np.sum(~ok)))
    os.makedirs(params['path_out'], exist_ok=True)
    np.savez_compressed(os.path.join(params['path_out'], NAME_NPZ),
                        rays=np.asarray(list_rays),
                        shifts=np.asarray(list_shifts))

    model_single, cdf = rg.transform_rays_model_cdf_mixture(list_rays)
    with open(os.path.join(params['path_out'], NAME_SINGLE), 'wb') as fp:
        pickle.dump({'name': 'cdf', 'cdfs': cdf, 'model': model_single}, fp)

    model_mix, mean_cdf = rg.transform_rays_model_sets_mean_cdf_mixture(
        list_rays, params['nb_components'])
    with open(os.path.join(params['path_out'], NAME_MIXTURE), 'wb') as fp:
        pickle.dump({'name': 'set_cdfs', 'cdfs': mean_cdf,
                     'model': model_mix}, fp)
    logging.info('exported single + mixture shape models')
    return params


if __name__ == '__main__':
    logging.basicConfig(level=logging.INFO)
    main(arg_parse_params())
