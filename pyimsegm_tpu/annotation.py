"""Annotation handling: color<->label conversion, quantization, inpainting.

Counterpart of `/root/reference/imsegm/annotation.py`.  The per-color scans
of the reference become one batched (pixels x colors) L1 distance computed on
device; nearest-pixel inpainting is an iterative label-propagation sweep
instead of a host KD-tree.
"""

import logging
import os

import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.utils import ImageDimensionError

#: annotated landmark columns (`annotation.py:22`)
COLUMNS_POSITION = ('ant_x', 'ant_y', 'post_x', 'post_y', 'lat_x', 'lat_y')
SLICE_NAME_GROUPING = 'stack_path'
#: z-distance tolerance per egg stage (`annotation.py:25-32`)
ANNOT_SLICE_DIST_TOL = {1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 0}
#: default label colours (`annotation.py:34-43`)
DICT_COLOURS = {
    0: (0, 0, 255),
    1: (255, 0, 0),
    2: (0, 255, 0),
    3: (255, 229, 0),
    4: (142, 68, 173),
    5: (127, 140, 141),
    6: (0, 212, 255),
    7: (128, 0, 0),
}


def unique_image_colors(img):
    """All unique colours in an RGB image (`annotation.py:46-69`).

    :returns: list of (r, g, b) tuples
    """
    arr = np.asarray(img)
    pixels = arr.reshape(-1, arr.shape[-1])[:, :3]
    uq = np.unique(pixels, axis=0)
    return [tuple(int(v) for v in c) for c in uq]


def convert_img_colors_to_labels(img_rgb, lut_label_color):
    """RGB annotation -> label map by a label->color dictionary
    (`annotation.py:72-91`).

    >>> seg = np.array([[0, 1, 1], [1, 0, 0]])
    >>> img = np.array([(0.2, 0.2, 0.2), (0.9, 0.9, 0.9)])[seg]
    >>> convert_img_colors_to_labels(img, {0: (0.2, 0.2, 0.2),
    ...                                    1: (0.9, 0.9, 0.9)})
    array([[0, 1, 1],
           [1, 0, 0]])
    """
    return convert_img_colors_to_labels_reverted(
        img_rgb, {tuple(v): k for k, v in lut_label_color.items()})


def convert_img_colors_to_labels_reverted(img_rgb, dict_color_label):
    """RGB annotation -> label map by a color->label dictionary; raises when
    pixels stay unmatched (`annotation.py:94-125`)."""
    img_rgb = np.asarray(img_rgb)
    img_labels = np.zeros(img_rgb.shape[:-1], dtype=int)
    matched = np.zeros(img_rgb.shape[:-1], dtype=bool)
    for color, label in dict_color_label.items():
        m = np.all(img_rgb == np.asarray(color), axis=2)
        img_labels[m] = label
        matched |= m
    if not np.all(matched):
        raise ValueError('There is different number of pixels than number of'
                         ' converted labels.')
    return img_labels


def convert_img_labels_to_colors(segm, lut_label_colors):
    """Label map -> RGB image (`annotation.py:128-161`)."""
    segm = np.asarray(segm)
    uq = np.unique(segm)
    if not all(lb in lut_label_colors for lb in uq):
        raise ValueError('some labels %r are missing in dictionary %r'
                         % (uq, list(lut_label_colors.keys())))
    min_label = int(segm.min())
    lut = [lut_label_colors.get(i + min_label)
           for i in range(int(segm.max()) - min_label + 1)]
    lut = [c if c is not None else (0, 0, 0) for c in lut]
    return np.array(lut)[segm - min_label]


def image_frequent_colors(img, ratio_threshold=1e-3):
    """Colours covering at least ``ratio_threshold`` of pixels
    (`annotation.py:164-196`).

    :returns: {(r, g, b): count}
    """
    img = np.asarray(img)
    if img.ndim == 3:
        img = img[:, :, :3]
    pixels = img.reshape(-1, img.shape[-1])
    nb_pixels = len(pixels)
    colors, counts = np.unique(pixels, axis=0, return_counts=True)
    keep = counts >= nb_pixels * ratio_threshold
    return {tuple(int(v) for v in c): int(n)
            for c, n in zip(colors[keep], counts[keep])}


def group_images_frequent_colors(paths_img, ratio_threshold=1e-3):
    """Aggregate frequent colours over image files (`annotation.py:199-227`)."""
    from pyimsegm_tpu.utils.data_io import io_imread
    dict_colors = {}
    for path_im in paths_img:
        for clr, cnt in image_frequent_colors(io_imread(path_im),
                                              ratio_threshold).items():
            dict_colors[clr] = dict_colors.get(clr, 0) + cnt
    return dict_colors


def _nearest_color_lut(img, colors):
    """(H, W) index of the L1-nearest colour, one batched device op."""
    pixels = jnp.asarray(np.asarray(img).reshape(-1, np.asarray(img).shape[-1]),
                         jnp.float32)
    cols = jnp.asarray(np.asarray(list(colors)), jnp.float32)
    dist = jnp.sum(jnp.abs(pixels[:, None, :] - cols[None, :, :]), axis=-1)
    return np.asarray(jnp.argmin(dist, axis=1)).reshape(np.asarray(img).shape[:2])


def image_color_2_labels(img, colors=None):
    """Quantize image pixels to indices of the nearest colour
    (`annotation.py:230-253`)."""
    if not colors:
        colors = list(image_frequent_colors(img).keys())
    return _nearest_color_lut(img, colors)


def quantize_image_nearest_color(img, colors):
    """Quantize image to its nearest colours (`annotation.py:256-279`)."""
    img = np.asarray(img)
    lut = _nearest_color_lut(img, colors)
    return np.asarray(np.asarray(list(colors))[lut], dtype=img.dtype)


def image_inpaint_pixels(img, valid_mask):
    """Fill invalid pixels with the value of the nearest valid pixel
    (`annotation.py:282-289`)."""
    img = np.asarray(img)
    valid_mask = np.asarray(valid_mask, bool)
    if img.shape != valid_mask.shape:
        raise ImageDimensionError('image size %r and mask size %r should be'
                                  ' equal' % (img.shape, valid_mask.shape))
    from scipy import interpolate
    coords = np.array(np.nonzero(valid_mask)).T
    values = img[valid_mask]
    it = interpolate.NearestNDInterpolator(coords, values)
    out = it(list(np.ndindex(img.shape))).reshape(img.shape)
    return out


def quantize_image_nearest_pixel(img, colors):
    """Snap pixels that exactly hit a palette colour, then spread those
    labels to all remaining pixels by nearest spatial neighbour
    (reference behaviour: `annotation.py:292-320`).
    """
    img = np.asarray(img)
    palette = np.asarray(list(colors))
    # (N, H, W) exact-hit volume over the whole palette at once
    hits = (img[None] == palette[:, None, None, :]).all(axis=-1)
    matched = hits.any(axis=0)
    labels = hits.argmax(axis=0).astype(float)
    labels[~matched] = np.nan
    filled = image_inpaint_pixels(labels, matched).astype(int)
    return palette[filled]


def load_info_group_by_slices(path_txt, stages,
                              pos_columns=COLUMNS_POSITION,
                              dict_slice_tol=ANNOT_SLICE_DIST_TOL):
    """Group landmark annotations of ovary stacks by nearby z-slices
    (`annotation.py:324-370`).

    :returns: DataFrame indexed by image name with per-slice position arrays
    """
    import pandas as pd
    df = pd.read_csv(path_txt, sep='\t', index_col=0)
    df = df[df['stage'].isin(list(stages))]
    df = df.sort_values(['stage'], ascending=False)

    rows = []
    for _, df_group in df.groupby(SLICE_NAME_GROUPING):
        slice_idxs = df_group['slice_index'].values
        slice_tols = np.array([dict_slice_tol[i]
                               for i in df_group['stage'].values])
        for _, row in df_group.iterrows():
            diff = np.abs(slice_idxs - row['slice_index'])
            filter_slice = diff <= slice_tols
            dict_slice = {col: df_group[col].values[filter_slice]
                          for col in pos_columns}
            dict_slice['image'] = os.path.splitext(row['image_path'])[0]
            rows.append(dict_slice)
    df_marked = pd.DataFrame(rows)
    if not df_marked.empty:
        df_marked.set_index('image', inplace=True)
    return df_marked


logging.getLogger(__name__).addHandler(logging.NullHandler())
