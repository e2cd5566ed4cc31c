"""Cartesian <-> radial unwrap between two circles + segmentation.

Mirrors `/root/reference/notebooks/transform-img-plane_inter-circle.ipynb`:
an annular region of interest (between an inner and an outer circle around a
chosen centre) is unwrapped into a rectangular (angle x radius) plane,
segmented there with the unsupervised pipeline — where the annular texture
becomes translation-invariant stripes — and the labels are mapped back.
"""

import argparse
import os

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyimsegm_tpu import pipelines
from pyimsegm_tpu.utils import data_samples, drawing

OUT = os.path.join(os.path.dirname(__file__), 'output')


def cartesian_to_radial(img, centre, rad_in, rad_out, nb_angles=360):
    """Unwrap the annulus (rad_in..rad_out around centre) to a
    (radius, angle, C) plane by bilinear sampling."""
    nb_rad = int(rad_out - rad_in)
    ang = np.linspace(0, 2 * np.pi, nb_angles, endpoint=False)
    rad = np.linspace(rad_in, rad_out, nb_rad)
    rr, aa = np.meshgrid(rad, ang, indexing='ij')
    ys = centre[0] + rr * np.sin(aa)
    xs = centre[1] + rr * np.cos(aa)
    y0 = np.clip(np.floor(ys).astype(int), 0, img.shape[0] - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, img.shape[1] - 2)
    fy = np.clip(ys - y0, 0, 1)[..., None]
    fx = np.clip(xs - x0, 0, 1)[..., None]
    out = ((1 - fy) * (1 - fx) * img[y0, x0]
           + (1 - fy) * fx * img[y0, x0 + 1]
           + fy * (1 - fx) * img[y0 + 1, x0]
           + fy * fx * img[y0 + 1, x0 + 1])
    return out, (ys, xs)


def radial_to_cartesian(segm_rad, centre, rad_in, rad_out, shape):
    """Inverse map: label every annulus pixel from its (radius, angle) bin."""
    nb_rad, nb_angles = segm_rad.shape
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
    dy, dx = yy - centre[0], xx - centre[1]
    rr = np.hypot(dy, dx)
    aa = np.arctan2(dy, dx) % (2 * np.pi)
    ri = np.rint((rr - rad_in) / (rad_out - rad_in) * (nb_rad - 1)).astype(int)
    ai = np.rint(aa / (2 * np.pi) * nb_angles).astype(int) % nb_angles
    inside = (rr >= rad_in) & (rr <= rad_out)
    out = np.full(shape, -1, dtype=int)
    out[inside] = segm_rad[ri[inside].clip(0, nb_rad - 1), ai[inside]]
    return out


def main(quick=False):
    os.makedirs(OUT, exist_ok=True)
    img = np.asarray(data_samples.load_sample_image(
        data_samples.IMAGE_STAR), float)
    centre = (img.shape[0] // 2, img.shape[1] // 2)
    rad_in, rad_out = 40, min(centre) - 10
    print('image %s, annulus %d..%d px around %s'
          % (img.shape, rad_in, rad_out, (centre,)))

    img_rad, _coords = cartesian_to_radial(img, centre, rad_in, rad_out,
                                           nb_angles=180 if quick else 360)
    print('radial plane:', img_rad.shape)

    segm_rad, _ = pipelines.pipe_color2d_slic_features_model_graphcut(
        img_rad, nb_classes=3, dict_features={'color': ['mean', 'std']},
        sp_size=20, sp_regul=0.25, gc_regul=1.0)
    segm_back = radial_to_cartesian(np.asarray(segm_rad), centre, rad_in,
                                    rad_out, img.shape[:2])
    annulus = np.pi * (rad_out ** 2 - rad_in ** 2) / np.prod(img.shape[:2])
    print('classes:', np.unique(segm_rad).tolist(),
          'mapped-back cover: %.2f (annulus %.2f)'
          % (float((segm_back >= 0).mean()), annulus))

    fig = drawing.figure_image_segm_results(img_rad, np.asarray(segm_rad))
    fig.savefig(os.path.join(OUT, 'radial_plane_segm.png'), dpi=90)
    fig = drawing.figure_image_segm_results(img, np.maximum(segm_back, 0))
    fig.savefig(os.path.join(OUT, 'radial_back_segm.png'), dpi=90)
    print('wrote radial_plane_segm.png / radial_back_segm.png to', OUT)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    main(**vars(ap.parse_args()))
