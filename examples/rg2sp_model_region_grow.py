"""RG2Sp on langerhans islets: set-CDF mixture shape model + prior maps.

Mirrors `/root/reference/notebooks/RG2Sp_model_region-grow.ipynb` (the one
notebook without a round-1 counterpart): load the measured egg ray shapes
from `eggs_ray-shapes.csv`, fit the *sets-mean-CDF mixture* shape model
(``transform_rays_model_sets_mean_cdf_mixture``, 5 components), render each
component's radial prior map back into image space, then run GraphCut
region growing in ``set_cdfs`` mode on a langerhans-islet slice (instance
centres from the labelled annotation) with the per-iteration debug history
figure.
"""

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from pyimsegm_tpu import pipelines  # noqa: E402
from pyimsegm_tpu import region_growing as rg  # noqa: E402
from pyimsegm_tpu import superpixels  # noqa: E402
from pyimsegm_tpu.utils import data_io, data_samples, drawing, metrics  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), 'output')
OVARY = os.path.join(data_samples.PATH_DATA_IMAGES, 'drosophila_ovary_slice')
LANGER = os.path.join(data_samples.PATH_DATA_IMAGES, 'langerhans_islets')
NAME = 'Lh05-09'
SLIC_SIZE, SLIC_REGUL = 25, 0.2


def compute_prior_map(cdist, size=(500, 800), step=5):
    """Rasterise one radial survival table into an image-space prior map
    (the notebook's `compute_prior_map`, vectorised: one device call for
    the whole point grid instead of a python loop per pixel block)."""
    from pyimsegm_tpu.ops.shape_prior import shape_prior_points
    prior_map = np.zeros(size)
    centre = np.array(size) / 2.0
    ys, xs = np.mgrid[0:size[0]:step, 0:size[1]:step]
    pts = np.stack([ys.ravel(), xs.ravel()], axis=1).astype(float)
    priors = np.asarray(shape_prior_points(pts, np.asarray(cdist, float),
                                           centre, 0.0))
    for (y, x), p in zip(pts.astype(int), priors):
        prior_map[y:y + step, x:x + step] = p
    return prior_map


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)

    # -- shape model from the measured ray shapes (as the notebook loads)
    df = pd.read_csv(os.path.join(OVARY, 'eggs_ray-shapes.csv'), index_col=0)
    list_rays = df.values
    list_rays = list_rays[np.all(np.isfinite(list_rays), axis=1)]
    model_rg, list_mean_cdf = rg.transform_rays_model_sets_mean_cdf_mixture(
        list_rays.tolist(), nb_components=5)

    # -- prior-map panel: one radial prior per mixture component
    import matplotlib.pyplot as plt
    ncomp = len(list_mean_cdf)
    fig, axes = plt.subplots(1, ncomp, figsize=(3 * ncomp, 2.2))
    for ax, (_mean, cdf) in zip(np.atleast_1d(axes), list_mean_cdf):
        ax.imshow(compute_prior_map(cdf, size=(400, 500), step=10),
                  cmap='Greys_r')
        ax.set_xticks([]), ax.set_yticks([])
    fig.savefig(os.path.join(OUT, 'rg2sp_model_prior_maps.png'),
                bbox_inches='tight', dpi=80)
    plt.close(fig)

    # -- langerhans slice: instance centres from the labelled annotation
    img, _ = data_io.load_image_2d(os.path.join(LANGER, 'image', NAME + '.jpg'))
    annot, _ = data_io.load_image_2d(os.path.join(LANGER, 'annot', NAME + '.png'))
    annot = np.asarray(annot)
    if annot.ndim == 3:
        annot = annot[..., 0]
    from scipy import ndimage
    inst, _n = ndimage.label(annot > 0)
    centres = np.array([np.mean(np.argwhere(inst == lb), axis=0)
                        for lb in range(1, int(inst.max()) + 1)
                        if np.sum(inst == lb) > 500])

    # -- superpixels + foreground probability from an unsupervised 2-class
    # segmentation (the notebook hand-mixes channels + a trained classifier;
    # the probability source is interchangeable for the RG2Sp demo)
    segm2, _ = pipelines.pipe_color2d_slic_features_model_graphcut(
        np.asarray(img), 2, {'color': ['mean', 'std']},
        sp_size=SLIC_SIZE, sp_regul=SLIC_REGUL, gc_regul=1.0)
    slic = superpixels.segment_slic_img2d(np.asarray(img), sp_size=SLIC_SIZE,
                                          relative_compact=SLIC_REGUL)
    # orient class 1 = islet (the class covering the annotation)
    fg_cls = int(np.round(np.mean(segm2[annot > 0])))
    table = [0.9, 0.1] if fg_cls == 0 else [0.1, 0.9]
    slic_prob_fg = rg.compute_segm_prob_fg(slic, segm2, table)

    debug_gc = {}
    labels_gc = rg.region_growing_shape_slic_graphcut(
        slic, slic_prob_fg, centres, (model_rg, list_mean_cdf), 'set_cdfs',
        coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        optim_global=False, nb_iter=3 if quick else 65,
        allow_obj_swap=False, dict_thresholds=rg.RG2SP_THRESHOLDS,
        debug_history=debug_gc)
    segm_obj = np.asarray(labels_gc)[slic]

    fig = drawing.figure_rg2sp_debug_complete(segm2, slic, debug_gc,
                                              iter_index=-1)
    fig.savefig(os.path.join(OUT, 'rg2sp_model_region_grow_debug.png'),
                bbox_inches='tight', dpi=80)
    plt.close(fig)

    ars = metrics.adjusted_rand_score(inst.ravel(), segm_obj.ravel())
    print('RG2Sp set_cdfs on %s: %d objects, ARS vs annotation %.4f'
          % (NAME, int(segm_obj.max()), float(ars)))
    np.savez_compressed(os.path.join(OUT, 'rg2sp_model_region_grow.npz'),
                        segm_obj=segm_obj.astype(np.int32))
    return float(ars)


if __name__ == '__main__':
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--quick', action='store_true',
                    help='3 RG iterations only (smoke test)')
    main(quick=ap.parse_args().quick)
