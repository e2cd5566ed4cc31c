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
        f, n = _texture_battery_features(image, seg_ids, num_segments, flags,
                                         bank, 'tGabor', grid_ctx=grid_ctx)
        feats.append(f)
        names += n

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
    subtraction, one batched bank convolution, then batched post-scaled
    channel statistics (see :func:`_texture_battery_features`)."""
    bank = _get_bank(bank_type)
    return _texture_battery_features(image, seg_ids, num_segments, flags,
                                     bank, 'tLM', grid_ctx=grid_ctx)


def _texture_battery_features(image, seg_ids, num_segments, flags, bank,
                              prefix, grid_ctx=None):
    """Per-superpixel statistics of a filter bank's battery responses.

    The reference normalises each battery response by
    ``log(1+||r||)/0.03/||r||`` before computing statistics
    (`descriptors.py:1021-1027,1088-1094`).  That scale is linear per
    battery, so every statistic commutes with it (mean/std/median/meanGrad
    by ``s``, energy by ``s**2``) and ``||r||**2`` equals the total of the
    per-superpixel energy sums.  This lets all B batteries' moment
    statistics ride ONE segment reduction over the raw (B*C)-channel stack —
    instead of B normalisation passes over full-resolution responses plus B
    separate reductions — with the normalisation applied to the (K, C)
    statistics afterwards.  Results are identical up to float ordering.
    """
    image = jnp.asarray(image, jnp.float32)
    img = filter_ops.subtract_background(image, sigma=150.0)
    raw = filter_ops.filter_bank_raw(img, bank)              # (B, H, W, C)
    b, h, w, c = raw.shape
    stack = jnp.moveaxis(raw, 0, 2).reshape(h, w, b * c)     # battery-major

    ones = jnp.ones((h, w, 1), jnp.float32)
    if grid_ctx is not None:
        # moments kernel synthesizes the squared/ones channels in VMEM — the
        # (H, W, 2BC+1) stacked tensor never exists in HBM
        from pyimsegm_tpu.ops.grid import grid_geometry_moments
        labels2d, cfg = grid_ctx
        msums = grid_geometry_moments(stack, labels2d, cfg)  # (K, 2BC+3)
        sums = msums[:, :2 * b * c]
        cnt = msums[:, 2 * b * c:2 * b * c + 1]
    else:
        asums = segment_stats._reduce_sums(
            jnp.concatenate([stack, stack * stack, ones], -1),
            seg_ids, num_segments, grid_ctx)                 # (K, 2BC+1)
        sums, cnt = asums[:, :-1], asums[:, -1:]
    safe = jnp.maximum(cnt, 1.0)
    mean_r = sums[:, :b * c] / safe                          # (K, B*C)
    energy_sums = sums[:, b * c:2 * b * c]
    energy_r = energy_sums / safe
    std_r = jnp.sqrt(jnp.maximum(energy_r - mean_r * mean_r, 0.0))
    # per-battery ||r||^2 from the segment energy sums (all pixels covered)
    scales = filter_ops.battery_norm_scales(
        jnp.sum(energy_sums.reshape(num_segments, b, c), axis=(0, 2)))

    want_median = 'median' in flags
    want_grad = 'meanGrad' in flags
    if want_median:
        median_r = segment_stats.segment_median(
            stack.reshape(-1, b * c), seg_ids, num_segments)
    if want_grad:
        grad = jnp.stack([segment_stats.image_gradient_sum(stack[..., i])
                          for i in range(b * c)], axis=-1)
        gsum = segment_stats._reduce_sums(
            jnp.concatenate([grad, ones], -1), seg_ids, num_segments,
            grid_ctx)
        grad_r = gsum[:, :b * c] / jnp.maximum(gsum[:, -1:], 1.0)

    feats, names = [], []
    for bi, bname in enumerate(bank.names):
        s = scales[bi]
        cols = slice(bi * c, (bi + 1) * c)
        blocks = {'mean': s * mean_r[:, cols],
                  'std': s * std_r[:, cols],
                  'energy': (s * s) * energy_r[:, cols]}
        if want_median:
            blocks['median'] = s * median_r[:, cols]
        if want_grad:
            blocks['meanGrad'] = s * grad_r[:, cols]
        feats.append(jnp.concatenate(
            [blocks[f] for f in NAMES_FEATURE_FLAGS if f in flags], axis=-1))
        ch = ['%s_%s-ch%i' % (prefix, bname, i + 1) for i in range(c)]
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
    """Gray 2D features (`descriptors.py:1171-1204`).

    With ``grid_ctx`` the intensity statistics take the scatter-free
    grid reduction (single-channel :func:`compute_channel_statistics`),
    matching the color path's fast path; texture batteries and the
    no-context case go through the 3D formulation with a singleton z."""
    color_keys = [k for k in dict_features if k.startswith('color')]
    other = {k: v for k, v in dict_features.items() if k not in color_keys}
    if grid_ctx is None or not color_keys:
        return compute_selected_features_gray3d(image[None], seg_ids,
                                                num_segments, dict_features)
    flags = tuple(np.unique(np.concatenate(
        [list(dict_features[k]) for k in color_keys])))
    flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in flags)
    image = jnp.asarray(image, jnp.float32)
    feats = [segment_stats.compute_channel_statistics(
        image[..., None], seg_ids, num_segments, flags, grid_ctx=grid_ctx)]
    names = ['gray_%s' % f for f in flags]
    if other:
        f3, n3 = compute_selected_features_gray3d(image[None], seg_ids,
                                                  num_segments, other)
        feats.append(f3)
        names += n3
    return jnp.nan_to_num(jnp.concatenate(feats, axis=-1)), names


def compute_selected_features_gray3d(volume, seg_ids, num_segments,
                                     dict_features, grid_ctx3d=None):
    """Features for a 3D gray volume (`descriptors.py:1109-1168`).

    :param volume: (Z, H, W) float array
    :param seg_ids: (Z*H*W,) int32
    :param grid_ctx3d: optional (labels3d, Slic3DConfig) enabling the
        scatter-free 27-offset reduction for grid-structured supervoxels
    """
    volume = jnp.asarray(volume, jnp.float32)
    feats, names = [], []
    color_keys = [k for k in dict_features if k.startswith('color')]
    if color_keys:
        flags = tuple(np.unique(np.concatenate([list(dict_features[k]) for k in color_keys])))
        # keep canonical ordering
        flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in flags)
        feats.append(_gray3d_statistics(volume, seg_ids, num_segments, flags,
                                        grid_ctx3d=grid_ctx3d))
        names += ['gray_%s' % f for f in flags]
    texture_keys = [k for k in dict_features if k.startswith('tLM')]
    for key in texture_keys:
        bank_type = key.split('_')[-1] if '_' in key else 'normal'
        flags = tuple(dict_features[key])
        f, n = _texture_features_gray3d(volume, seg_ids, num_segments, flags,
                                        bank_type, grid_ctx3d=grid_ctx3d)
        feats.append(f)
        names += n
    features = jnp.concatenate(feats, axis=-1)
    return jnp.nan_to_num(features), names


def _texture_features_gray3d(volume, seg_ids, num_segments, flags, bank_type,
                             grid_ctx3d=None):
    """LM texture statistics over a gray volume: per-slice 2D background
    subtraction + bank response (the reference treats z-slices independently,
    `descriptors.py:969-994`), reduced per 3D segment."""
    bank = _get_bank(bank_type)
    img = jnp.stack([filter_ops.subtract_background(volume[z][..., None], 150.0)[..., 0]
                     for z in range(volume.shape[0])])
    resp_slices = [filter_ops.filter_bank_response(img[z][..., None], bank)
                   for z in range(volume.shape[0])]
    responses = jnp.stack(resp_slices, axis=1)[..., 0]   # (B, Z, H, W)
    feats, names = [], []
    for bi, bname in enumerate(bank.names):
        feats.append(_gray3d_statistics(responses[bi], seg_ids, num_segments,
                                        flags, grid_ctx3d=grid_ctx3d))
        names += ['tLM_%s_%s' % (bname, f) for f in flags]
    return jnp.concatenate(feats, axis=-1), names


def _gray3d_statistics(volume, seg_ids, num_segments, flags, grid_ctx3d=None):
    flat = volume.reshape(-1, 1)
    blocks = []
    moment_flags = tuple(f for f in ('mean', 'std', 'energy') if f in flags)
    if grid_ctx3d is not None and moment_flags:
        from pyimsegm_tpu.ops.slic3d import grid3d_segment_sum
        labels3d, cfg3 = grid_ctx3d
        ones = jnp.ones(volume.shape + (1,), jnp.float32)
        sums = grid3d_segment_sum(
            jnp.concatenate([volume[..., None], (volume * volume)[..., None],
                             ones], axis=-1), labels3d, cfg3)
        safe = jnp.maximum(sums[:, 2:3], 1.0)
        mean = sums[:, 0:1] / safe
        energy = sums[:, 1:2] / safe
        moments = {'mean': mean, 'energy': energy,
                   'std': jnp.sqrt(jnp.maximum(energy - mean * mean, 0.0))}
    else:
        moments = segment_stats.segment_mean_std_energy(
            flat, seg_ids, num_segments, flags=moment_flags)
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


# ------------------- per-statistic twins (host reference + device) ---------
# The reference exposes numpy_*/cython_* implementation pairs
# (`descriptors.py:209-702`); here the numpy_* twins are host golden
# references and the cython_* names are aliases of the device (TPU segment
# reduction) implementations, keeping the dual-implementation surface.

def _label_counts(seg, nb_lbs):
    counts = np.bincount(np.asarray(seg).ravel(), minlength=nb_lbs).astype(float)
    counts[counts == 0] = -1   # empty-segment guard (`descriptors.py:329-331`)
    return counts


def numpy_img2d_color_mean(img, seg):
    """Per-segment channel means, pure numpy (`descriptors.py:299-334`).

    >>> img = np.array([[[1., 0., 0.]] * 3 + [[0., 1., 0.]] * 3] * 2)
    >>> seg = np.array([[0] * 3 + [1] * 3] * 2)
    >>> numpy_img2d_color_mean(img, seg)
    array([[1., 0., 0.],
           [0., 1., 0.]])
    """
    img, seg = np.asarray(img, float), np.asarray(seg)
    nb = int(seg.max()) + 1
    counts = _label_counts(seg, nb)
    sums = np.stack([np.bincount(seg.ravel(), weights=img[..., c].ravel(),
                                 minlength=nb) for c in range(img.shape[-1])], 1)
    return sums / counts[:, None]


def numpy_img2d_color_energy(img, seg):
    """Per-segment channel mean of squares (`descriptors.py:364-398`)."""
    img = np.asarray(img, float)
    return numpy_img2d_color_mean(img ** 2, seg)


def numpy_img2d_color_std(img, seg, means=None):
    """Per-segment channel standard deviation (`descriptors.py:337-361`)."""
    if means is None:
        means = numpy_img2d_color_mean(img, seg)
    energy = numpy_img2d_color_energy(img, seg)
    return np.sqrt(np.maximum(energy - np.asarray(means) ** 2, 0.0))


def numpy_img2d_color_median(img, seg):
    """Per-segment channel median (`descriptors.py:420-455`)."""
    img, seg = np.asarray(img, float), np.asarray(seg)
    nb = int(seg.max()) + 1
    flat_seg = seg.ravel()
    flat = img.reshape(-1, img.shape[-1])
    out = np.zeros((nb, img.shape[-1]))
    for lb in range(nb):
        sel = flat[flat_seg == lb]
        if len(sel):
            out[lb] = np.median(sel, axis=0)
    return out


def numpy_img3d_gray_mean(img, seg):
    """Per-segment means over a gray volume (`descriptors.py:560-587`)."""
    img, seg = np.asarray(img, float), np.asarray(seg)
    nb = int(seg.max()) + 1
    counts = _label_counts(seg, nb)
    sums = np.bincount(seg.ravel(), weights=img.ravel(), minlength=nb)
    return sums / counts


def numpy_img3d_gray_energy(img, seg):
    """Per-segment mean of squares over a gray volume
    (`descriptors.py:617-644`)."""
    return numpy_img3d_gray_mean(np.asarray(img, float) ** 2, seg)


def numpy_img3d_gray_std(img, seg, means=None):
    """Per-segment std over a gray volume (`descriptors.py:590-614`)."""
    if means is None:
        means = numpy_img3d_gray_mean(img, seg)
    energy = numpy_img3d_gray_energy(img, seg)
    return np.sqrt(np.maximum(energy - np.asarray(means) ** 2, 0.0))


def numpy_img3d_gray_median(img, seg):
    """Per-segment median over a gray volume (`descriptors.py:671-702`)."""
    img, seg = np.asarray(img, float), np.asarray(seg)
    nb = int(seg.max()) + 1
    out = np.zeros(nb)
    flat_seg, flat = seg.ravel(), img.ravel()
    for lb in range(nb):
        sel = flat[flat_seg == lb]
        if len(sel):
            out[lb] = np.median(sel)
    return out


def _device_color_stat(img, seg, stat):
    seg = np.asarray(seg)
    nb = int(seg.max()) + 1
    flat = jnp.asarray(np.asarray(img, np.float32)).reshape(-1, np.shape(img)[-1])
    res = segment_stats.segment_mean_std_energy(
        flat, jnp.asarray(seg.ravel(), jnp.int32), nb, flags=(stat,))
    return np.asarray(res[stat], float)


def cython_img2d_color_mean(img, seg):
    """Device (TPU segment-sum) twin of :func:`numpy_img2d_color_mean` —
    the role the Cython kernel plays in the reference
    (`features_cython.pyx:81`)."""
    return _device_color_stat(img, seg, 'mean')


def cython_img2d_color_energy(img, seg):
    """Device twin of :func:`numpy_img2d_color_energy` (pyx:101)."""
    return _device_color_stat(img, seg, 'energy')


def cython_img2d_color_std(img, seg, means=None):
    """Device twin of :func:`numpy_img2d_color_std` (pyx:122)."""
    return _device_color_stat(img, seg, 'std')


def _device_gray3d_stat(img, seg, stat):
    seg = np.asarray(seg)
    nb = int(seg.max()) + 1
    flat = jnp.asarray(np.asarray(img, np.float32)).reshape(-1, 1)
    res = segment_stats.segment_mean_std_energy(
        flat, jnp.asarray(seg.ravel(), jnp.int32), nb, flags=(stat,))
    return np.asarray(res[stat], float)[:, 0]


def cython_img3d_gray_mean(img, seg):
    """Device twin of :func:`numpy_img3d_gray_mean` (pyx:144); unlike the
    reference's OpenMP kernel this reduction is race-free across z-slices
    (`descriptors.py:461-463` documents the reference's race)."""
    return _device_gray3d_stat(img, seg, 'mean')


def cython_img3d_gray_energy(img, seg):
    """Device twin of :func:`numpy_img3d_gray_energy` (pyx:169)."""
    return _device_gray3d_stat(img, seg, 'energy')


def cython_img3d_gray_std(img, seg, mean=None):
    """Device twin of :func:`numpy_img3d_gray_std` (pyx:194)."""
    return _device_gray3d_stat(img, seg, 'std')


def cython_label_hist_seg2d(segm_select, struc_elem, nb_labels):
    """Label histogram of a pre-cropped window under a binary element
    (`descriptors.py:1462-1495`).

    >>> segm = np.zeros((10, 10), dtype=int)
    >>> segm[1:9, 2:8] = 1
    >>> cython_label_hist_seg2d(segm[5:8, 5:8], np.ones((3, 3)), 2)
    array([0., 9.])
    """
    segm_select = np.asarray(segm_select)
    struc_elem = np.asarray(struc_elem)
    if segm_select.shape != struc_elem.shape:
        raise ValueError('segm %r and element %r should match'
                         % (segm_select.shape, struc_elem.shape))
    sel = segm_select[struc_elem == 1]
    return np.bincount(sel.ravel(), minlength=nb_labels).astype(float)[:nb_labels]


# -------------------------------------------- statistic dispatchers --------

def compute_image2d_color_statistic(image, segm,
                                    feature_flags=NAMES_FEATURE_FLAGS,
                                    color_name='color'):
    """Complete per-segment statistics for a color 2D image with the
    reference signature (`descriptors.py:787-863`): takes the 2D label map,
    returns host arrays.

    :returns: ((nb_segments, F) features, list of F names)
    """
    segm = np.asarray(segm)
    nb = int(segm.max()) + 1
    flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in tuple(feature_flags))
    feats = segment_stats.compute_channel_statistics(
        jnp.asarray(np.asarray(image), jnp.float32),
        jnp.asarray(segm.ravel(), jnp.int32), nb, flags)
    ch = ['%s-ch%i' % (color_name, i + 1) for i in range(np.shape(image)[-1])]
    return np.nan_to_num(np.asarray(feats)), _stat_names(ch, flags)


def compute_image3d_gray_statistic(image, segm,
                                   feature_flags=NAMES_FEATURE_FLAGS,
                                   ch_name='gray'):
    """Complete per-segment statistics for a gray 3D volume
    (`descriptors.py:705-784`).

    :returns: ((nb_segments, F) features, list of F names)
    """
    segm = np.asarray(segm)
    nb = int(segm.max()) + 1
    flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in tuple(feature_flags))
    feats = _gray3d_statistics(jnp.asarray(np.asarray(image), jnp.float32),
                               jnp.asarray(segm.ravel(), jnp.int32), nb, flags)
    names = ['%s_%s' % (ch_name, f) for f in flags]
    return np.nan_to_num(np.asarray(feats)), names


def compute_texture_desc_lm_img2d_clr(img, seg, feature_flags,
                                      bank_type='normal'):
    """LM texture statistics with the reference signature
    (`descriptors.py:1041-1106`)."""
    seg = np.asarray(seg)
    nb = int(seg.max()) + 1
    flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in tuple(feature_flags))
    feats, names = _texture_features_color2d(
        jnp.asarray(np.asarray(img), jnp.float32),
        jnp.asarray(seg.ravel(), jnp.int32), nb, flags, bank_type)
    return np.nan_to_num(np.asarray(feats)), names


def compute_texture_desc_lm_img3d_val(img, seg, feature_flags,
                                      bank_type='normal'):
    """LM texture statistics over a gray volume (`descriptors.py:997-1038`):
    per-z-slice bank responses reduced per 3D segment."""
    seg = np.asarray(seg)
    nb = int(seg.max()) + 1
    flags = tuple(f for f in NAMES_FEATURE_FLAGS if f in tuple(feature_flags))
    volume = jnp.asarray(np.asarray(img), jnp.float32)
    seg_ids = jnp.asarray(seg.ravel(), jnp.int32)
    feats, names = _texture_features_gray3d(volume, seg_ids, nb, flags,
                                            bank_type)
    return np.nan_to_num(np.asarray(feats)), names


# ------------------------------------------------ filter-bank helpers ------

def make_gaussian_filter1d(vals, sigma, order=0):
    """1D (derivative-of-)Gaussian response, L1-normalised
    (`descriptors.py:880-891`)."""
    if order > 2:
        raise ValueError('only orders up to 2 are supported')
    return filter_ops._gaussian_1d(np.asarray(vals, float), sigma, order)


def make_edge_filter2d(sig, phase, points, sup):
    """Oriented edge/bar filter from sampled points
    (`descriptors.py:894-900`)."""
    return filter_ops._edge_filter_2d(sig, phase, np.asarray(points, float), sup)


def compute_img_filter_response2d(img, filter_battery):
    """Response of one filter battery: max over its oriented filters
    (`descriptors.py:951-966`).  Host convenience API — the hot path is the
    single batched convolution in
    :func:`pyimsegm_tpu.ops.filters.filter_bank_response`.
    """
    from scipy import ndimage
    battery = np.asarray(filter_battery, float)
    if battery.ndim == 2:
        battery = battery[None]
    img = np.asarray(img, float)
    resp = np.stack([ndimage.convolve(img, k) for k in battery])
    resp = resp[0] if len(resp) == 1 else resp.max(axis=0)
    return np.clip(resp, -filter_ops.MAX_SIGNAL_RESPONSE,
                   filter_ops.MAX_SIGNAL_RESPONSE)


def compute_img_filter_response3d(img, filter_battery):
    """Battery response per z-slice of a volume (`descriptors.py:969-978`)."""
    img = np.asarray(img, float)
    return np.stack([compute_img_filter_response2d(img[z], filter_battery)
                     for z in range(img.shape[0])])


def image_subtract_gauss_smooth(img, sigma):
    """Subtract a per-slice Gaussian background, z-slices independent
    (`descriptors.py:981-994`)."""
    from scipy.ndimage import gaussian_filter
    img = np.asarray(img, float)
    if sigma <= 0:
        return img
    return img - np.stack([gaussian_filter(img[z], sigma)
                           for z in range(img.shape[0])])


# ------------------------------------------------------- ray twins ---------

def numpy_ray_features_seg2d(seg_binary, position, angle_step=5., edge='up'):
    """Host golden ray march (`descriptors.py:1662-1712`): from ``position``
    step along each angle until the boundary condition is met; -1 when the
    ray exits the image.

    >>> seg = np.ones((100, 150), dtype=bool)
    >>> yy, xx = np.mgrid[:100, :150]
    >>> seg[((yy - 50) ** 2 + (xx - 75) ** 2) <= 40 ** 2] = False
    >>> numpy_ray_features_seg2d(seg, (50, 75), 45).astype(int)[:4]
    array([41, 41, 41, 41])
    """
    seg_binary = np.asarray(seg_binary).astype(bool)
    angles = np.arange(0, 360, angle_step)
    ray_dist = np.full(len(angles), -1.0)
    if seg_binary[int(position[0]), int(position[1])] and edge == 'up':
        return ray_dist * 0
    height, width = seg_binary.shape
    diag = int(np.hypot(height, width))
    for i, ang in enumerate(angles):
        rad = np.deg2rad(ang)
        grad = np.array([np.sin(rad), np.cos(rad)])
        grad = grad / max(np.abs(grad))
        pos = np.array(position, float)
        last = seg_binary[int(position[0]), int(position[1])]
        for _ in range(diag):
            pos = pos + grad
            r, c = int(round(pos[0])), int(round(pos[1]))
            if pos[0] < 0 or r >= height or pos[1] < 0 or c >= width:
                break
            actual = seg_binary[r, c]
            if (edge == 'up' and actual) or (edge == 'down' and last and not actual):
                ray_dist[i] = np.hypot(*(pos - np.asarray(position, float)))
                break
            last = actual
    return ray_dist


def cython_ray_features_seg2d(seg_binary, position, angle_step=5., edge='up'):
    """Device twin of :func:`numpy_ray_features_seg2d` — the vectorised
    masked-ladder march (`features_cython.pyx:239` in the reference)."""
    from pyimsegm_tpu.ops import ray as ray_ops
    return np.asarray(ray_ops.compute_ray_features_segm_2d(
        np.asarray(seg_binary), position, angle_step=angle_step,
        smooth_coef=0, edge=edge), float)


def compute_ray_features_segm_2d_vectors(seg_binary, position, angle_step=5.,
                                         smooth_coef=0, edge='up'):
    """Reference-parity alias for the (slow, rotation-based) ray variant
    (`descriptors.py:1545-1628`): same output contract as
    :func:`compute_ray_features_segm_2d`, computed with the direct vectorised
    march instead of whole-image rotations."""
    from pyimsegm_tpu.ops import ray as ray_ops
    return np.asarray(ray_ops.compute_ray_features_segm_2d(
        np.asarray(seg_binary), position, angle_step=angle_step,
        smooth_coef=smooth_coef, edge=edge), float)


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
