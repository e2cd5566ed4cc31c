"""Label-map algebra and relabeling.

Counterpart of `/root/reference/imsegm/labeling.py`, with the hot overlap
histograms computed as one device contingency table (segment-sum) instead of
Python pixel loops; the small LUT manipulations stay host-side numpy.
"""

import numpy as np
from scipy import ndimage

from pyimsegm_tpu.utils import ImageDimensionError
from pyimsegm_tpu.utils.metrics import contingency_table


def histogram_regions_labels_counts(slic, segm):
    """Overlap counts between superpixels and an annotation
    (`labeling.py:208-242`); (max_slic+1, max_label+1)."""
    if slic.shape != segm.shape:
        raise ImageDimensionError('dimension does not agree')
    segm = np.asarray(segm)
    if (np.unique(segm) < 0).sum() != 0:
        raise ValueError('only positive labels are allowed')
    n_slic = int(np.max(slic)) + 1
    n_lb = int(segm.max()) + 1
    return np.asarray(contingency_table(slic, segm, n_slic, n_lb))


def histogram_regions_labels_norm(slic, segm, nb_labels=None):
    """Row-normalised overlap histogram (`labeling.py:245-278`); empty
    superpixels give zero rows."""
    hist = histogram_regions_labels_counts(slic, segm)
    if nb_labels is not None and hist.shape[1] < nb_labels:
        hist = np.pad(hist, [(0, 0), (0, nb_labels - hist.shape[1])])
    sums = hist.sum(axis=1, keepdims=True)
    sums[sums == 0] = -1.0
    out = hist / sums
    out[out < 0] = 0.0
    return out


def segm_labels_assignment(segm, segm_gt):
    """Per-region list of ground-truth labels (`labeling.py:172-204`)."""
    if segm_gt.shape != segm.shape:
        raise ImageDimensionError('segm %r and annot %r should match'
                                  % (segm.shape, segm_gt.shape))
    labels = np.unique(segm)
    out = {int(lb): segm_gt[segm == lb].tolist() for lb in labels}
    return out


def assign_label_by_threshold(dict_label_hist, thresh=0.75):
    """LUT by purity threshold; impure regions get −1 (`labeling.py:300-324`)."""
    lut = np.zeros(max(dict_label_hist.keys()) + 1, dtype=int) - 1
    for k, v in dict_label_hist.items():
        counts = np.bincount(v) / float(len(v))
        mx = counts.max()
        if mx > thresh:
            lut[k] = int(np.argmax(counts))
    return lut


def assign_label_by_max(label_hist):
    """LUT by majority label (`labeling.py:327-346`)."""
    lut = np.zeros(max(label_hist.keys()) + 1, dtype=int) - 1
    for k, v in label_hist.items():
        lut[k] = int(np.argmax(np.bincount(v)))
    return lut


def convert_segms_2_list(segms):
    """Flatten segmentations for metric evaluation (`labeling.py:349-361`)."""
    return np.concatenate([np.asarray(s).ravel() for s in segms]).tolist()


def mask_segm_labels(img_labeling, labels, mask_init=None):
    """Boolean mask of any of the given labels (`labeling.py:364-393`)."""
    mask = (np.zeros(np.shape(img_labeling), dtype=bool)
            if mask_init is None else mask_init.copy())
    for lb in labels:
        mask |= (np.asarray(img_labeling) == lb)
    return mask


def relabel_by_dict(labels, dict_labels):
    """Relabel by {new: [old...]} map (`labeling.py:439-456`)."""
    if not dict_labels:
        raise ValueError('"dict_labels" is required')
    labels = np.asarray(labels)
    out = np.zeros_like(labels)
    for lb_new, lbs_old in dict_labels.items():
        for lb_old in lbs_old:
            out[labels == lb_old] = lb_new
    return out


def merge_probab_labeling_2d(proba, dict_labels):
    """Merge probability channels by label groups (`labeling.py:459-487`)."""
    proba = np.asarray(proba)
    if proba.ndim != 3:
        raise ValueError('expected (H, W, C) probabilities')
    if not dict_labels:
        raise ValueError('"dict_labels" is required')
    out = np.zeros(proba.shape[:2] + (max(dict_labels) + 1,))
    for lb_new, lbs_old in dict_labels.items():
        out[:, :, lb_new] = proba[:, :, lbs_old].sum(axis=-1)
    return out


def compute_labels_overlap_matrix(seg1, seg2):
    """Integer overlap matrix of two segmentations (`labeling.py:490-523`);
    negative labels are ignored."""
    seg1 = np.asarray(seg1)
    seg2 = np.asarray(seg2)
    if seg1.shape != seg2.shape:
        raise ImageDimensionError('segm %r and segm %r should match'
                                  % (seg1.shape, seg2.shape))
    sel = (seg1 >= 0) & (seg2 >= 0)
    n1, n2 = int(seg1.max()) + 1, int(seg2.max()) + 1
    return np.asarray(contingency_table(seg1[sel], seg2[sel], n1, n2)).astype(int)


def relabel_max_overlap_unique(seg_ref, seg_relabel, keep_bg=False):
    """Rename ``seg_relabel`` labels so each takes the reference label it
    overlaps most, 1-1 (no two input labels may claim the same reference
    label; greedy by descending overlap, same policy as `labeling.py:526`).

    Input labels left without a reference partner keep their own id when
    still free, otherwise they get an arbitrary unclaimed id.
    """
    seg_ref = np.asarray(seg_ref)
    seg_relabel = np.asarray(seg_relabel)
    if seg_ref.shape != seg_relabel.shape:
        raise ImageDimensionError(
            'segmentation shapes differ: reference %r, input %r'
            % (seg_ref.shape, seg_relabel.shape))
    overlap = compute_labels_overlap_matrix(seg_ref, seg_relabel)
    n_in = int(seg_relabel.max()) + 1
    lut = np.full(n_in, -1, dtype=int)
    if keep_bg:
        lut[0] = 0
        overlap[0, :] = 0
        overlap[:, 0] = 0

    # greedy matching == visiting overlap cells largest-first and pairing
    # whenever both sides are still free (ties broken by row-major index,
    # like repeated argmax would)
    flat = overlap.ravel()
    ref_free = np.ones(overlap.shape[0], dtype=bool)
    if keep_bg:
        ref_free[0] = False
    for cell in np.lexsort((np.arange(flat.size), -flat)):
        if flat[cell] == 0:
            break
        rr, ee = divmod(cell, overlap.shape[1])
        if ref_free[rr] and ee < n_in and lut[ee] < 0:
            lut[ee] = rr
            ref_free[rr] = False

    # leftovers: identity where the own id is unclaimed...
    claimed = set(lut[lut >= 0].tolist())
    for ee in np.flatnonzero(lut < 0):
        if ee not in claimed:
            lut[ee] = ee
            claimed.add(ee)
    # ...then any unclaimed ids for the rest
    spare = (i for i in range(2 * n_in) if i not in claimed)
    for ee in np.flatnonzero(lut < 0):
        lut[ee] = next(spare)

    seg_new = lut[seg_relabel]
    return np.where(seg_relabel < 0, seg_relabel, seg_new)


def relabel_max_overlap_merge(seg_ref, seg_relabel, keep_bg=False):
    """Rename every ``seg_relabel`` label to its best-overlapping reference
    label, allowing many-to-one merges (`labeling.py:617-681` semantics).

    Input labels that overlap nothing in the reference keep their own id.
    """
    seg_ref = np.asarray(seg_ref)
    seg_relabel = np.asarray(seg_relabel)
    if seg_ref.shape != seg_relabel.shape:
        raise ImageDimensionError(
            'segmentation shapes differ: reference %r, input %r'
            % (seg_ref.shape, seg_relabel.shape))
    overlap = compute_labels_overlap_matrix(seg_ref, seg_relabel)
    if keep_bg:
        # background is pinned; other labels choose among nonzero refs only
        lut = np.concatenate([[0], overlap[1:, 1:].argmax(axis=0) + 1])
    else:
        lut = overlap.argmax(axis=0)
    untouched = overlap.sum(axis=0) == 0
    lut = np.where(untouched, np.arange(lut.size), lut)
    seg_new = lut[seg_relabel]
    return np.where(seg_relabel < 0, seg_relabel, seg_new)


def find_boundaries(segm):
    """'thick' boundaries: pixels whose conn4 neighborhood contains another
    label (equivalent of ``skimage.segmentation.find_boundaries(mode='thick')``)."""
    segm = np.asarray(segm)
    b = np.zeros(segm.shape, dtype=bool)
    b[:-1, :] |= segm[:-1, :] != segm[1:, :]
    b[1:, :] |= segm[1:, :] != segm[:-1, :]
    b[:, :-1] |= segm[:, :-1] != segm[:, 1:]
    b[:, 1:] |= segm[:, 1:] != segm[:, :-1]
    return b


def compute_boundary_distances(segm_ref, segm):
    """Distances from reference boundary pixels to the nearest segmentation
    boundary (`labeling.py:684-716`)."""
    if segm_ref.shape != segm.shape:
        raise ImageDimensionError('Ref. segm %r and segm %r should match'
                                  % (segm_ref.shape, segm.shape))
    ref_b = find_boundaries(segm_ref)
    seg_b = find_boundaries(segm)
    dist_map = ndimage.distance_transform_edt(~seg_b)
    points = np.argwhere(ref_b)
    return points, dist_map[ref_b].ravel()


def get_image2d_boundary_color(segm, size=1):
    """Majority label on the image boundary ring (reference
    `data_io.py:1002`)."""
    segm = np.asarray(segm)
    ring = np.concatenate([
        segm[:size, :].ravel(), segm[-size:, :].ravel(),
        segm[:, :size].ravel(), segm[:, -size:].ravel()])
    vals, cnt = np.unique(ring, return_counts=True)
    return int(vals[np.argmax(cnt)])


def assume_bg_on_boundary(segm, bg_label=0, boundary_size=1):
    """Swap labels so the dominant boundary label becomes background
    (`labeling.py:719-754`)."""
    segm = np.asarray(segm)
    boundary_lb = get_image2d_boundary_color(segm, size=boundary_size)
    used = np.unique(segm)
    if boundary_lb not in used:
        segm = segm.copy()
        segm[segm == boundary_lb] = bg_label
    else:
        lut = list(range(int(used.max()) + 1))
        lut[boundary_lb] = bg_label
        lut[bg_label] = boundary_lb
        segm = np.array(lut)[segm]
    return segm


# ----------------------------------------------------- contours & distance ---

def neighbour_connect4(seg, label, pos):
    """True when any conn4 neighbour differs from ``label``
    (`labeling.py:17-32`).

    >>> neighbour_connect4(np.eye(5), 1, (2, 2))
    True
    >>> neighbour_connect4(np.ones((5, 5)), 1, (3, 3))
    False
    """
    seg = np.asarray(seg)
    return any(seg[pos[0] + a, pos[1] + b] != label
               for a, b in [(-1, 0), (0, -1), (1, 0), (0, 1)])


def _contour_mask(seg, label=1, include_boundary=False):
    """Vectorized conn4 inner-boundary mask of one label
    (`labeling.py:34-79` without the pixel loops)."""
    seg = np.asarray(seg)
    is_lb = seg == label
    diff = np.zeros(seg.shape, bool)
    diff[1:, :] |= seg[1:, :] != seg[:-1, :]
    diff[:-1, :] |= seg[:-1, :] != seg[1:, :]
    diff[:, 1:] |= seg[:, 1:] != seg[:, :-1]
    diff[:, :-1] |= seg[:, :-1] != seg[:, 1:]
    res = is_lb & diff
    # interior-only semantics: the reference never marks the first/last
    # row/col unless include_boundary
    res[0, :] = res[-1, :] = res[:, 0] = res[:, -1] = False
    if include_boundary:
        res[0, :] |= is_lb[0, :]
        res[-1, :] |= is_lb[-1, :]
        res[:, 0] |= is_lb[:, 0]
        res[:, -1] |= is_lb[:, -1]
    return res


def contour_binary_map(seg, label=1, include_boundary=False):
    """Binary inner-contour image of one label (`labeling.py:34-79`).

    >>> img = np.zeros((6, 6), dtype=int)
    >>> img[1:5, 2:] = 1
    >>> contour_binary_map(img)
    array([[0, 0, 0, 0, 0, 0],
           [0, 0, 1, 1, 1, 0],
           [0, 0, 1, 0, 0, 0],
           [0, 0, 1, 0, 0, 0],
           [0, 0, 1, 1, 1, 0],
           [0, 0, 0, 0, 0, 0]])
    """
    return _contour_mask(seg, label, include_boundary).astype(int)


def contour_coords(seg, label=1, include_boundary=False):
    """Contour pixel coordinates of one label (`labeling.py:82-117`).

    >>> img = np.zeros((6, 6), dtype=int)
    >>> img[1:5, 2:] = 1
    >>> contour_coords(img)
    [[1, 2], [1, 3], [1, 4], [2, 2], [3, 2], [4, 2], [4, 3], [4, 4]]
    """
    inner = _contour_mask(seg, label, include_boundary=False)
    coords = np.argwhere(inner).tolist()
    if include_boundary:
        seg = np.asarray(seg)
        w, h = seg.shape[:2]
        for i in range(w):
            if seg[i, 0] == label:
                coords.append([i, 0])
            if seg[i, -1] == label:
                coords.append([i, h - 1])
        for j in range(h):
            if seg[0, j] == label:
                coords.append([0, j])
            if seg[-1, j] == label:
                coords.append([w - 1, j])
    return coords


def binary_image_from_coords(coords, size):
    """Rasterise contour points (`labeling.py:120-143`)."""
    contour_map = np.zeros(size, dtype=int)
    w, h = size
    for cd in coords:
        if 0 <= cd[0] < w and 0 <= cd[1] < h:
            contour_map[cd[0], cd[1]] = 1
    return contour_map


def compute_distance_map(seg, label=1):
    """Euclidean distance from the label's inner contour
    (`labeling.py:146-169`).

    >>> img = np.zeros((6, 6), dtype=int)
    >>> img[1:5, 2:] = 1
    >>> np.round(compute_distance_map(img)[1], 2).tolist()
    [2.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    """
    contour_map = 1 - contour_binary_map(seg, label)
    return ndimage.distance_transform_edt(contour_map)


def sequence_labels_merge(labels_stack, dict_colors, labels_free,
                          change_label=-1):
    """Merge a temporal stack of labelings: keep labels constant over time
    (free labels wildcard), else ``change_label`` (`labeling.py:396-436`).

    >>> dict_colors = {0: [], 1: [], 2: []}
    >>> sequence_labels_merge(np.ones((8, 1, 1)), dict_colors, [0])
    array([[1]])
    >>> sequence_labels_merge(np.array([[1], [0], [1], [1], [1], [1], [0], [0]]), dict_colors, [0])
    array([1])
    """
    labels_stack = np.array(labels_stack)
    im_labels = np.full(labels_stack.shape[1:], change_label, dtype=int)
    labels_used = [lb for lb in dict_colors if lb not in labels_free]
    lb_all = labels_used + list(labels_free) + [change_label]
    if not all(lb in lb_all for lb in np.unique(labels_stack)):
        raise ValueError('some extra labels in image stack')
    mask_free = mask_segm_labels(labels_stack, labels_free)
    for lb in labels_used:
        mask1 = mask_segm_labels(labels_stack, [lb], mask_free)
        mask2 = mask_segm_labels(labels_stack, [lb])
        mask = np.logical_and(np.all(mask1, axis=0), np.any(mask2, axis=0))
        im_labels[mask] = lb
    return im_labels
