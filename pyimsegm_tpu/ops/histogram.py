"""Label histograms around positions (center-detection features).

TPU-native form of ``compute_label_histograms_positions``
(`/root/reference/imsegm/descriptors.py:1288-1369`): the reference crops a
disk window per position per diameter on the host; here the per-pixel disk
counts for every label are computed once as cumsum-decomposed disk sums
(`pyimsegm_tpu.ops.morphology.disk_count_map`) and the positions just gather
from the resulting maps — annuli differences and ring normalisation follow
the reference numerics exactly (incl. cropped element sizes at the image
border).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops.morphology import disk_count_map

#: concentric annuli radii (the reference calls them circle "diameters",
#: `descriptors.py:53`; they are fed to ``morphology.disk`` as radii)
HIST_CIRCLE_DIAGONALS = (10, 20, 30, 40, 50)


@functools.partial(jax.jit, static_argnames=('nb_labels', 'diameters'))
def label_hist_maps(segm, nb_labels, diameters=HIST_CIRCLE_DIAGONALS):
    """Per-pixel label histogram maps for each disk radius.

    :param segm: (H, W) int labels or (H, W, L) probability planes
    :param nb_labels: static number of labels
    :returns: (counts (n_diam, L, H, W), sizes (n_diam, H, W))
    """
    if segm.ndim == 2:
        planes = [(segm == lb).astype(jnp.float32) for lb in range(nb_labels)]
    else:
        planes = [segm[..., lb].astype(jnp.float32) for lb in range(nb_labels)]
    ones = jnp.ones(planes[0].shape, jnp.float32)
    stack = jnp.stack(planes + [ones])                   # (L+1, H, W)
    counts, sizes = [], []
    for d in diameters:
        from pyimsegm_tpu.ops.morphology import disk_count_maps
        m = disk_count_maps(stack, d)                    # one scan, all planes
        counts.append(m[:nb_labels])
        sizes.append(m[nb_labels])
    return jnp.stack(counts), jnp.stack(sizes)


def compute_label_histograms_positions(segm, positions, diameters=HIST_CIRCLE_DIAGONALS,
                                       nb_labels=None):
    """Annuli label histograms at positions (`descriptors.py:1288-1369`).

    :param segm: (H, W) int labels or (H, W, L) probabilities
    :param positions: (P, 2) array of (x, y) positions — NB the reference
        indexes ``segm[position[0], position[1]]`` with (row, col) when 2D
        positions are given as (row, col); we follow (row, col)
    :returns: ((P, n_diam * L) histograms, names)
    """
    segm = jnp.asarray(segm)
    if nb_labels is None:
        if segm.ndim == 2:
            nb_labels = int(jnp.max(segm)) + 1
        else:
            nb_labels = segm.shape[-1]
    counts, sizes = label_hist_maps(segm, nb_labels, tuple(diameters))
    pos = jnp.asarray(positions, jnp.int32)
    h, w = segm.shape[:2]
    py = jnp.clip(pos[:, 0], 0, h - 1)
    px = jnp.clip(pos[:, 1], 0, w - 1)

    c_at = counts[:, :, py, px]                     # (n_diam, L, P)
    s_at = sizes[:, py, px]                         # (n_diam, P)

    feats = []
    prev_c = jnp.zeros_like(c_at[0])
    prev_s = jnp.zeros_like(s_at[0])
    for i in range(len(diameters)):
        ring = (c_at[i] - prev_c) / jnp.maximum(s_at[i] - prev_s, 1.0)[None]
        feats.append(ring.T)                        # (P, L)
        prev_c, prev_s = c_at[i], s_at[i]
    hists = jnp.concatenate(feats, axis=1)
    names = ['hist-d_%i-lb_%i' % (d, lb)
             for d in diameters for lb in range(nb_labels)]
    return hists, names
