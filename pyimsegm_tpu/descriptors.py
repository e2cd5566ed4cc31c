"""Superpixel feature extraction (color statistics + LM texture).

TPU-native counterpart of `/root/reference/imsegm/descriptors.py`: the same
feature-flag surface (``{'color[_<space>]': [stats...], 'tLM[_short]':
[stats...]}``) and the same feature naming/ordering, but computed as fused
segment reductions and one batched filter-bank convolution on device.

Feature name grammar (matches `descriptors.py:804-808,1035,1103`):
  ``color-ch1_mean``, ``lab-ch2_std``, ``tLM_sigma1.4-edge-ch1_mean``, ...
"""


import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops import color as color_ops
from pyimsegm_tpu.ops import filters as filter_ops
from pyimsegm_tpu.ops import segment_stats

#: statistic flags in canonical order (`descriptors.py:36`)
NAMES_FEATURE_FLAGS = ('mean', 'std', 'energy', 'median', 'meanGrad')
#: feature-set presets (`descriptors.py:42-51`)
FEATURES_SET_ALL = {
    'color': ('mean', 'std', 'energy', 'median', 'meanGrad'),
    'tLM': ('mean', 'std', 'energy', 'median', 'meanGrad'),
}
FEATURES_SET_COLOR = {'color': ('mean', 'std', 'energy')}
FEATURES_SET_TEXTURE = {'tLM': ('mean', 'std', 'energy')}
FEATURES_SET_TEXTURE_SHORT = {'tLM_short': ('mean', 'std', 'energy')}

_BANK_CACHE = {}


def _get_bank(bank_type):
    if bank_type not in _BANK_CACHE:
        if bank_type == 'short':
            _BANK_CACHE[bank_type] = filter_ops.create_filter_bank_lm_2d(
                sigmas=filter_ops.SHORT_FILTERS_SIGMAS, nb_orient=4)
        else:
            _BANK_CACHE[bank_type] = filter_ops.create_filter_bank_lm_2d()
    return _BANK_CACHE[bank_type]


def _stat_names(ch_names, flags):
    return ['%s_%s' % (n, f) for f in NAMES_FEATURE_FLAGS if f in flags for n in ch_names]


def _get_gabor_bank():
    if 'gabor' not in _BANK_CACHE:
        _BANK_CACHE['gabor'] = filter_ops.create_filter_bank_gabor_2d()
    return _BANK_CACHE['gabor']


def compute_selected_features_color2d(image, seg_ids, num_segments, dict_features,
                                      grid_ctx=None):
    """Features for a 2D color image over flat superpixel ids.

    :param image: (H, W, 3) float array (device)
    :param seg_ids: (H*W,) int32 labels in [0, num_segments)
    :param num_segments: static superpixel capacity
    :param dict_features: e.g. ``{'color': ('mean','std'), 'tLM': ('mean',)}``
    :param grid_ctx: optional (labels2d, SlicConfig) for scatter-free reductions
    :returns: ((num_segments, F) device features, list of F names)

    Traceable under jit for a fixed ``dict_features``.
    """
    image = jnp.asarray(image, jnp.float32)
    feats, names = [], []
    color_keys = [k for k in dict_features if k.startswith('color')]
    for key in color_keys:
        space = key.split('_')[-1] if '_' in key else 'rgb'
        img_c = color_ops.convert_img_color_from_rgb(image, space) if '_' in key else image
        flags = tuple(dict_features[key])
        feats.append(segment_stats.compute_channel_statistics(
            img_c, seg_ids, num_segments, flags, grid_ctx=grid_ctx))
        ch = ['%s-ch%i' % (space if '_' in key else 'color', i + 1) for i in range(3)]
        names += _stat_names(ch, flags)

    texture_keys = [k for k in dict_features if k.startswith('tLM')]
    for key in texture_keys:
        bank_type = key.split('_')[-1] if '_' in key else 'normal'
        flags = tuple(dict_features[key])
        f, n = _texture_features_color2d(image, seg_ids, num_segments, flags,
                                         bank_type, grid_ctx=grid_ctx)
        feats.append(f)
        names += n

    gabor_keys = [k for k in dict_features if k.startswith('tGabor')]
    for key in gabor_keys:
        flags = tuple(dict_features[key])
        bank = _get_gabor_bank()
        img = filter_ops.subtract_background(image, sigma=150.0)
        responses = filter_ops.filter_bank_response(img, bank)
        for bi, bname in enumerate(bank.names):
            feats.append(segment_stats.compute_channel_statistics(
                responses[bi], seg_ids, num_segments, flags,
                grid_ctx=grid_ctx))
            ch = ['tGabor_%s-ch%i' % (bname, i + 1) for i in range(3)]
            names += _stat_names(ch, flags)

    lbp_keys = [k for k in dict_features if k.startswith('tLBP')]
    for _key in lbp_keys:
        f, n = filter_ops.lbp_histogram_features(image, seg_ids, num_segments,
                                                 grid_ctx=grid_ctx)
        feats.append(f)
        names += n

    unknown = [k for k in dict_features
               if k not in color_keys + texture_keys + gabor_keys + lbp_keys]
    if unknown:
        raise ValueError('unrecognised feature groups: %r' % unknown)
    features = jnp.concatenate(feats, axis=-1)
    features = jnp.nan_to_num(features)
    if features.shape[1] != len(names):
        raise ValueError('features %r vs names %i' % (features.shape, len(names)))
    return features, names


def _texture_features_color2d(image, seg_ids, num_segments, flags, bank_type,
                              grid_ctx=None):
    """LM texture statistics (`descriptors.py:1041-1106`): background
    subtraction, one batched bank convolution, per-battery normalisation,
    then channel statistics per battery."""
    bank = _get_bank(bank_type)
    img = filter_ops.subtract_background(image, sigma=150.0)
    responses = filter_ops.filter_bank_response(img, bank)   # (B, H, W, C)
    feats, names = [], []
    for bi, bname in enumerate(bank.names):
        resp = responses[bi]
        feats.append(segment_stats.compute_channel_statistics(
            resp, seg_ids, num_segments, flags, grid_ctx=grid_ctx))
        ch = ['tLM_%s-ch%i' % (bname, i + 1) for i in range(3)]
        names += _stat_names(ch, flags)
    return jnp.concatenate(feats, axis=-1), names


def compute_selected_features_img2d(image, seg_ids, num_segments, dict_features,
                                    grid_ctx=None):
    """Dispatch on image kind like `descriptors.py:1273-1286`: (H, W, 3) ->
    color statistics, (H, W) -> gray statistics."""
    if image.ndim == 3 and image.shape[-1] == 3:
        return compute_selected_features_color2d(image, seg_ids, num_segments,
                                                 dict_features, grid_ctx=grid_ctx)
    if image.ndim == 2:
        return compute_selected_features_gray2d(image, seg_ids, num_segments,
                                                dict_features, grid_ctx=grid_ctx)
    raise ValueError('invalid image size - %r' % (image.shape,))


def compute_selected_features_gray2d(image, seg_ids, num_segments, dict_features,
                                     grid_ctx=None):
    """Gray 2D features via the 3D path with a singleton z axis
    (`descriptors.py:1171-1204`)."""
    return compute_selected_features_gray3d(image[None], seg_ids, num_segments,
                                            dict_features)


def compute_selected_features_gray3d(volume, seg_ids, num_segments, dict_features):
    """Features for a 3D gray volume (`descriptors.py:1109-1168`).

    :param volume: (Z, H, W) float array
    :param seg_ids: (Z*H*W,) int32
    """
    volume = jnp.asarray(volume, jnp.float32)
    feats, names = [], []
    color_keys = [k for k in dict_features if k.startswith('color')]
    if color_keys:
        flags = tuple(np.unique(np.concatenate([list(dict_features[k]) for k in color_keys])))
        # keep canonical ordering
        flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in flags)
        feats.append(_gray3d_statistics(volume, seg_ids, num_segments, flags))
        names += ['gray_%s' % f for f in flags]
    texture_keys = [k for k in dict_features if k.startswith('tLM')]
    for key in texture_keys:
        bank_type = key.split('_')[-1] if '_' in key else 'normal'
        flags = tuple(dict_features[key])
        bank = _get_bank(bank_type)
        # per-slice 2D background subtraction + bank response, like the
        # reference treats z-slices independently (`descriptors.py:969-994`)
        img = jnp.stack([filter_ops.subtract_background(volume[z][..., None], 150.0)[..., 0]
                         for z in range(volume.shape[0])])
        resp_slices = [filter_ops.filter_bank_response(img[z][..., None], bank)
                       for z in range(volume.shape[0])]
        responses = jnp.stack(resp_slices, axis=1)[..., 0]   # (B, Z, H, W)
        for bi, bname in enumerate(bank.names):
            feats.append(_gray3d_statistics(responses[bi], seg_ids, num_segments, flags))
            names += ['tLM_%s_%s' % (bname, f) for f in flags]
    features = jnp.concatenate(feats, axis=-1)
    return jnp.nan_to_num(features), names


def _gray3d_statistics(volume, seg_ids, num_segments, flags):
    flat = volume.reshape(-1, 1)
    blocks = []
    moments = segment_stats.segment_mean_std_energy(
        flat, seg_ids, num_segments,
        flags=tuple(f for f in ('mean', 'std', 'energy') if f in flags))
    for f in ('mean', 'std', 'energy'):
        if f in flags:
            blocks.append(moments[f])
    if 'median' in flags:
        blocks.append(segment_stats.segment_median(flat, seg_ids, num_segments))
    if 'meanGrad' in flags:
        grad = jnp.stack([segment_stats.image_gradient_sum(volume[z])
                          for z in range(volume.shape[0])])
        blocks.append(segment_stats.segment_mean_std_energy(
            grad.reshape(-1, 1), seg_ids, num_segments, flags=('mean',))['mean'])
    return jnp.concatenate(blocks, axis=-1)


def feature_names(dict_features, gray3d=False):
    """Names only (no compute) for a given feature spec."""
    names = []
    color_keys = [k for k in dict_features if k.startswith('color')]
    texture_keys = [k for k in dict_features if k.startswith('tLM')]
    for key in color_keys:
        flags = tuple(dict_features[key])
        if gray3d:
            canonical = tuple(f for f in NAMES_FEATURE_FLAGS if f in flags)
            names += ['gray_%s' % f for f in canonical]
        else:
            space = key.split('_')[-1] if '_' in key else 'color'
            ch = ['%s-ch%i' % (space, i + 1) for i in range(3)]
            names += _stat_names(ch, flags)
    for key in texture_keys:
        bank_type = key.split('_')[-1] if '_' in key else 'normal'
        flags = tuple(dict_features[key])
        bank = _get_bank(bank_type)
        for bname in bank.names:
            if gray3d:
                names += ['tLM_%s_%s' % (bname, f) for f in flags]
            else:
                ch = ['tLM_%s-ch%i' % (bname, i + 1) for i in range(3)]
                names += _stat_names(ch, flags)
    return names


# -------------------------------------------------- windowed label hists ---

def adjust_bounding_box_crop(image_size, element_size, position):
    """Clip a window centred at ``position`` to the image; returns
    (im_begin, im_end, el_begin, el_end) per axis (`descriptors.py:1372-1410`).

    >>> adjust_bounding_box_crop((10, 10), (5, 5), (2, 2))
    ((0, 0), (5, 5), (0, 0), (5, 5))
    """
    im_begin, im_end, el_begin, el_end = [], [], [], []
    for dim in range(len(element_size)):
        half = element_size[dim] // 2
        lo = int(position[dim]) - half
        hi = lo + element_size[dim]
        im_begin.append(max(lo, 0))
        im_end.append(min(hi, image_size[dim]))
        el_begin.append(max(-lo, 0))
        el_end.append(element_size[dim] - max(hi - image_size[dim], 0))
    return tuple(im_begin), tuple(im_end), tuple(el_begin), tuple(el_end)


def compute_label_hist_segm(segm, position, struc_elem, nb_labels):
    """Label histogram inside a structuring element around a point
    (`descriptors.py:1413-1457`).

    >>> segm = np.zeros((10, 10), dtype=int)
    >>> segm[1:9, 2:8] = 1
    >>> segm[3:7, 4:6] = 2
    >>> compute_label_hist_segm(segm, [6, 6], np.ones((3, 3)), 3)
    (array([0., 7., 2.]), 9.0)
    """
    segm = np.asarray(segm)
    struc_elem = np.asarray(struc_elem)
    if segm.ndim != len(position):
        raise ValueError('dim of position %r should match the segmentation'
                         ' %r dim' % (position, segm.shape))
    ib, ie, bb, be = adjust_bounding_box_crop(segm.shape, struc_elem.shape,
                                              position)
    sel = segm[ib[0]:ie[0], ib[1]:ie[1]]
    el = struc_elem[bb[0]:be[0], bb[1]:be[1]]
    if sel.shape != el.shape:
        raise ValueError('segmentation %s and element %s should match'
                         % (sel.shape, el.shape))
    hist = np.zeros(nb_labels)
    for lb in range(nb_labels):
        hist[lb] = np.sum((sel == lb) & (el == 1))
    return hist, float(np.sum(struc_elem))


def compute_label_hist_proba(segm, position, struc_elem):
    """Windowed histogram over per-label probability planes
    (`descriptors.py:1498-1533`).

    >>> seg = np.zeros((50, 50, 2), dtype=float)
    >>> seg[15:35, 20:40, 1] = 1
    >>> seg[:, :, 0] = 1 - seg[:, :, 1]
    >>> compute_label_hist_proba(seg, (15, 20), np.ones((12, 13), dtype=int))
    (array([114.,  42.]), 156)
    """
    segm = np.asarray(segm)
    struc_elem = np.asarray(struc_elem)
    if segm.ndim != (len(position) + 1):
        raise ValueError('segment. (%r) should have larger (+1) dim than'
                         ' position %i' % (segm.shape, len(position)))
    ib, ie, bb, be = adjust_bounding_box_crop(segm.shape[:struc_elem.ndim],
                                              struc_elem.shape, position)
    sel = segm[ib[0]:ie[0], ib[1]:ie[1], :]
    el = struc_elem[bb[0]:be[0], bb[1]:be[1]]
    hist = np.sum(sel * el[..., None], axis=(0, 1))
    return hist, int(np.sum(struc_elem))


def norm_features(features, scaler=None):
    """Standard-score normalisation with a reusable (mean, std) scaler
    (`descriptors.py:866-878`)."""
    features = np.asarray(features, float)
    if scaler is None:
        scaler = (features.mean(axis=0), features.std(axis=0) + 1e-12)
    mu, sd = scaler
    return (features - mu) / sd, scaler


# -------------------------- public re-exports for reference API parity -----
# (the reference keeps these in `imsegm.descriptors`; the device kernels live
# in `pyimsegm_tpu.ops`)

from pyimsegm_tpu.ops.histogram import (  # noqa: E402,F401
    HIST_CIRCLE_DIAGONALS,
    compute_label_histograms_positions,
)
from pyimsegm_tpu.ops.ray import (  # noqa: E402,F401
    compute_ray_features_positions,
    compute_ray_features_segm_2d,
    interpolate_ray_dist,
    reconstruct_ray_features_2d,
    reduce_close_points,
    shift_ray_features,
)
from pyimsegm_tpu.ops.filters import (  # noqa: E402,F401
    create_filter_bank_lm_2d,
)
