"""Segmentation subset for running the reference: a from-scratch numpy
SLIC (the published algorithm with skimage's parameter conventions),
``relabel_sequential``, ``find_boundaries`` and ``mark_boundaries``.

SLIC follows the same spec the repo's TPU kernels implement
(`pyimsegm_tpu/ops/slic.py`): Lab conversion, sigma pre-smoothing, grid
seeding at half-step offsets, distance D^2 = dc^2 + ds^2 * (m/S)^2,
``max_num_iter`` assign/update rounds with the labels taken from the last
assignment, then connectivity enforcement that relabels components
sequentially and merges those smaller than ``min_size_factor * S^2`` into
an adjacent component.
"""

import numpy as np
from scipy import ndimage

from . import color as _color


def relabel_sequential(label_field, offset=1):
    label_field = np.asarray(label_field)
    uniq = np.unique(label_field)
    uniq_pos = uniq[uniq > 0]
    fw_map = np.zeros(int(uniq.max()) + 1 if uniq.size else 1, dtype=label_field.dtype)
    fw_map[uniq_pos] = np.arange(offset, offset + len(uniq_pos))
    relabeled = np.where(label_field > 0, fw_map[np.maximum(label_field, 0)],
                         label_field)
    inv_map = np.zeros(offset + len(uniq_pos), dtype=label_field.dtype)
    inv_map[offset:] = uniq_pos
    return relabeled, fw_map, inv_map


def find_boundaries(label_img, mode='thick', background=0):
    lbl = np.asarray(label_img)
    bound = np.zeros(lbl.shape, bool)
    for axis in range(lbl.ndim):
        diff = np.diff(lbl, axis=axis) != 0
        lo = [slice(None)] * lbl.ndim
        hi = [slice(None)] * lbl.ndim
        lo[axis] = slice(None, -1)
        hi[axis] = slice(1, None)
        if mode == 'inner':
            bound[tuple(lo)] |= diff & (lbl[tuple(hi)] == background)
            bound[tuple(hi)] |= diff & (lbl[tuple(lo)] == background)
        else:   # 'thick' (both sides) — 'outer'/'subpixel' approximated
            bound[tuple(lo)] |= diff
            bound[tuple(hi)] |= diff
    return bound


def mark_boundaries(image, label_img, color=(1, 1, 0), mode='thick', **_kw):
    img = np.asarray(image, np.float64)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.max() > 1.5:
        img = img / 255.0
    out = img.copy()
    out[find_boundaries(label_img, mode='thick')] = color
    return out


def _smooth(img, sigma):
    # scipy defaults (truncate=4, mode='reflect'), as skimage's slic uses
    if sigma <= 0:
        return img
    return ndimage.gaussian_filter(img, [sigma, sigma, 0])


def slic(image, n_segments=100, compactness=10.0, max_num_iter=10, sigma=0,
         enforce_connectivity=True, min_size_factor=0.5, max_size_factor=3.0,
         slic_zero=False, start_label=0, convert2lab=None, max_iter=None,
         multichannel=True, spacing=None, channel_axis='unset', **_kw):
    image = np.asarray(image, np.float32)
    if max_iter is not None:            # old skimage kwarg name
        max_num_iter = max_iter
    if channel_axis is None:
        multichannel = False
    if not multichannel and image.ndim == 3:
        # gray volume (the reference's 3D path, `superpixels.py:104-106`)
        return _slic3d_gray(image, n_segments, compactness, max_num_iter,
                            sigma, spacing, enforce_connectivity,
                            min_size_factor, start_label)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    # skimage order: sigma pre-smoothing happens BEFORE the Lab conversion
    # (skimage/segmentation/_slic.py applies ndi.gaussian_filter first)
    image = _smooth(image, float(sigma))
    if (convert2lab or (convert2lab is None and c == 3)):
        image = _color.rgb2lab(image).astype(np.float32)

    step = max(2, int(round(np.sqrt(h * w / max(n_segments, 1)))))
    gh = max(1, -(-h // step))
    gw = max(1, -(-w // step))
    cy = np.minimum((np.arange(gh) + 0.5) * step - 0.5, h - 1)
    cx = np.minimum((np.arange(gw) + 0.5) * step - 0.5, w - 1)
    iy = np.clip(np.round(cy).astype(int), 0, h - 1)
    ix = np.clip(np.round(cx).astype(int), 0, w - 1)
    centers_color = image[iy][:, ix].astype(np.float32)       # (gh, gw, c)
    centers_y = np.broadcast_to(cy[:, None], (gh, gw)).astype(np.float32).copy()
    centers_x = np.broadcast_to(cx[None, :], (gh, gw)).astype(np.float32).copy()

    py = np.arange(h, dtype=np.float32)[:, None]
    px = np.arange(w, dtype=np.float32)[None, :]
    ty = np.minimum(np.arange(h) // step, gh - 1)             # own tile row
    tx = np.minimum(np.arange(w) // step, gw - 1)
    sw = np.float32((compactness / step) ** 2)

    # per-cluster adaptive color normalisation for SLIC-zero
    max_dc = np.full((gh, gw), np.float32(compactness ** 2), np.float32)

    offsets = [(di, dj) for di in (-2, -1, 0, 1, 2) for dj in (-2, -1, 0, 1, 2)]

    def assign():
        best_d = np.full((h, w), np.inf, np.float32)
        best_lb = np.zeros((h, w), np.int32)
        best_dc = np.zeros((h, w), np.float32)
        for di, dj in offsets:
            sy = np.clip(ty + di, 0, gh - 1)
            sx = np.clip(tx + dj, 0, gw - 1)
            valid = ((ty + di >= 0) & (ty + di < gh))[:, None] \
                & ((tx + dj >= 0) & (tx + dj < gw))[None, :]
            cc = centers_color[sy][:, sx]                     # (h, w, c)
            dy = py - centers_y[sy][:, sx]
            dx = px - centers_x[sy][:, sx]
            dc2 = np.sum((image - cc) ** 2, axis=-1)
            ds2 = dy * dy + dx * dx
            if slic_zero:
                d = dc2 / np.maximum(max_dc[sy][:, sx], 1e-6) + ds2 / step ** 2
            else:
                d = dc2 + ds2 * sw
            d = np.where(valid, d, np.inf)
            take = d < best_d
            best_d = np.where(take, d, best_d)
            best_lb = np.where(take, (sy[:, None] * gw + sx[None, :]), best_lb)
            best_dc = np.where(take, dc2, best_dc)
        return best_lb, best_dc

    k = gh * gw
    labels = None
    for it in range(max(max_num_iter, 1)):
        labels, dc2 = assign()
        if it == max_num_iter - 1:
            break
        flat = labels.ravel()
        cnt = np.bincount(flat, minlength=k).astype(np.float32)
        safe = np.maximum(cnt, 1.0)
        for ch in range(c):
            centers_color[..., ch] = (np.bincount(
                flat, weights=image[..., ch].ravel(), minlength=k)
                / safe).reshape(gh, gw)
        centers_y = (np.bincount(flat, weights=np.broadcast_to(
            py, (h, w)).ravel(), minlength=k) / safe).reshape(gh, gw)
        centers_x = (np.bincount(flat, weights=np.broadcast_to(
            px, (h, w)).ravel(), minlength=k) / safe).reshape(gh, gw)
        if slic_zero:
            md = np.zeros(k, np.float32)
            np.maximum.at(md, flat, dc2.ravel())
            max_dc = np.maximum(md.reshape(gh, gw), 1.0)

    if enforce_connectivity:
        labels = _enforce_connectivity(labels, step, min_size_factor,
                                       start_label)
    else:
        labels = labels + start_label
    return labels


def _enforce_connectivity(labels, step, min_size_factor, start_label):
    """Relabel connected components sequentially (raster order of their
    first pixel); merge components below ``min_size_factor * step**2``
    into the adjacent component that precedes them."""
    h, w = labels.shape
    min_size = int(min_size_factor * step * step)
    comp = np.full((h, w), -1, np.int64)
    nxt = 0
    sizes = []
    first_px = []
    bboxes = []
    for lb in np.unique(labels):
        cc, n = ndimage.label(labels == lb)
        for ci, sl in enumerate(ndimage.find_objects(cc), start=1):
            sub = cc[sl] == ci
            comp[sl][sub] = nxt
            sizes.append(int(sub.sum()))
            ys, xs = np.nonzero(sub)
            o = np.lexsort((xs, ys))[0]
            first_px.append((sl[0].start + int(ys[o]), sl[1].start + int(xs[o])))
            bboxes.append(sl)
            nxt += 1
    sizes = np.asarray(sizes)

    # raster order of discovery, as a flood fill from (0,0) would see them
    order = np.argsort([fy * w + fx for fy, fx in first_px], kind='stable')
    remap = np.full(nxt, -1, np.int64)
    out_next = 0
    for comp_id in order:
        if sizes[comp_id] >= min_size or out_next == 0:
            remap[comp_id] = out_next
            out_next += 1
        else:
            # merge into an adjacent, already-relabelled component (work in
            # the component's bbox grown by one pixel)
            sl = bboxes[comp_id]
            gsl = (slice(max(sl[0].start - 1, 0), min(sl[0].stop + 1, h)),
                   slice(max(sl[1].start - 1, 0), min(sl[1].stop + 1, w)))
            win = comp[gsl]
            sel = win == comp_id
            nb = np.zeros_like(sel)
            nb[:-1] |= sel[1:]
            nb[1:] |= sel[:-1]
            nb[:, :-1] |= sel[:, 1:]
            nb[:, 1:] |= sel[:, :-1]
            nb &= ~sel
            nb_comp = win[nb]
            nb_comp = nb_comp[(nb_comp >= 0) & (remap[nb_comp] >= 0)]
            if len(nb_comp):
                vals, counts = np.unique(nb_comp, return_counts=True)
                remap[comp_id] = remap[vals[np.argmax(counts)]]
            else:
                remap[comp_id] = out_next
                out_next += 1
    return (remap[comp] + start_label).astype(np.int64)


def _slic3d_gray(vol, n_segments, compactness, max_num_iter, sigma, spacing,
                 enforce_conn, min_size_factor, start_label):
    """Gray-volume SLIC with anisotropic ``spacing`` (the published
    algorithm with skimage's conventions, as the 2D path above)."""
    spacing = np.ones(3) if spacing is None else np.asarray(spacing, float)
    if sigma and sigma > 0:
        sig = [float(sigma)] * 3
        vol = ndimage.gaussian_filter(vol, sig)
    dz, dh, dw = vol.shape
    # scaled coordinates; step from the scaled volume
    dims_sc = np.array([dz, dh, dw]) * spacing
    step = max(2.0, (np.prod(dims_sc) / max(n_segments, 1)) ** (1.0 / 3))
    grid = np.maximum(1, np.ceil(dims_sc / step).astype(int))
    gz, gy, gx = grid

    axes_sc = [np.arange(n) * s for n, s in zip((dz, dh, dw), spacing)]
    seeds_sc = [np.minimum((np.arange(g) + 0.5) * step - 0.5, ax[-1])
                for g, ax in zip(grid, axes_sc)]
    seed_idx = [np.clip(np.round(ss / s).astype(int), 0, n - 1)
                for ss, s, n in zip(seeds_sc, spacing, (dz, dh, dw))]
    cz, cy, cx = np.meshgrid(*seeds_sc, indexing='ij')          # scaled
    cval = vol[np.ix_(*seed_idx)].astype(np.float64)

    pz = axes_sc[0][:, None, None]
    py = axes_sc[1][None, :, None]
    px = axes_sc[2][None, None, :]
    tz = np.minimum((pz / step).astype(int), gz - 1)
    ty = np.minimum((py / step).astype(int), gy - 1)
    tx = np.minimum((px / step).astype(int), gx - 1)
    sw = (compactness / step) ** 2

    offsets = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
               for c in (-1, 0, 1)]

    def assign():
        best_d = np.full(vol.shape, np.inf)
        best_lb = np.zeros(vol.shape, np.int64)
        for da, db, dc in offsets:
            sa = np.clip(tz + da, 0, gz - 1)
            sb = np.clip(ty + db, 0, gy - 1)
            sc = np.clip(tx + dc, 0, gx - 1)
            valid = ((tz + da >= 0) & (tz + da < gz)
                     & (ty + db >= 0) & (ty + db < gy)
                     & (tx + dc >= 0) & (tx + dc < gx))
            d = ((vol - cval[sa, sb, sc]) ** 2
                 + ((pz - cz[sa, sb, sc]) ** 2 + (py - cy[sa, sb, sc]) ** 2
                    + (px - cx[sa, sb, sc]) ** 2) * sw)
            d = np.where(valid, d, np.inf)
            take = d < best_d
            best_d = np.where(take, d, best_d)
            best_lb = np.where(take, (sa * gy + sb) * gx + sc, best_lb)
        return best_lb

    k = gz * gy * gx
    labels = assign()
    for _it in range(max(max_num_iter, 1) - 1):
        flat = labels.ravel()
        cnt = np.maximum(np.bincount(flat, minlength=k), 1.0)

        def upd(vals):
            return (np.bincount(flat, weights=np.broadcast_to(
                vals, vol.shape).ravel(), minlength=k) / cnt).reshape(grid)

        cval, cz, cy, cx = upd(vol), upd(pz), upd(py), upd(px)
        labels = assign()

    if enforce_conn:
        # the size floor counts VOXELS: one superpixel covers step^3 of
        # scaled volume = step^3 / prod(spacing) voxels
        vox_per_sp = step ** 3 / np.prod(spacing)
        labels = _enforce_connectivity_nd(labels, vox_per_sp ** (1.0 / 3),
                                          min_size_factor, start_label)
    else:
        labels = labels + start_label
    return labels


def _enforce_connectivity_nd(labels, step, min_size_factor, start_label):
    """nD variant of `_enforce_connectivity`: sequential component relabel +
    merge of components below ``min_size_factor * step**ndim``."""
    nd = labels.ndim
    min_size = int(min_size_factor * step ** nd)
    comp = np.full(labels.shape, -1, np.int64)
    nxt = 0
    sizes, first_px, bboxes = [], [], []
    strides = np.cumprod([1] + list(labels.shape[::-1][:-1]))[::-1]
    for lb in np.unique(labels):
        cc, _n = ndimage.label(labels == lb)
        for ci, sl in enumerate(ndimage.find_objects(cc), start=1):
            sub = cc[sl] == ci
            comp[sl][sub] = nxt
            sizes.append(int(sub.sum()))
            idx = np.nonzero(sub)
            o = np.lexsort(idx[::-1])[0]
            first_px.append(sum((s.start + int(ix[o])) * st
                                for s, ix, st in zip(sl, idx, strides)))
            bboxes.append(sl)
            nxt += 1
    sizes = np.asarray(sizes)

    order = np.argsort(first_px, kind='stable')
    remap = np.full(nxt, -1, np.int64)
    out_next = 0
    for comp_id in order:
        if sizes[comp_id] >= min_size or out_next == 0:
            remap[comp_id] = out_next
            out_next += 1
            continue
        sl = bboxes[comp_id]
        gsl = tuple(slice(max(s.start - 1, 0), min(s.stop + 1, n))
                    for s, n in zip(sl, labels.shape))
        win = comp[gsl]
        sel = win == comp_id
        nb = np.zeros_like(sel)
        for ax in range(nd):
            lo = [slice(None)] * nd
            hi = [slice(None)] * nd
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            nb[tuple(lo)] |= sel[tuple(hi)]
            nb[tuple(hi)] |= sel[tuple(lo)]
        nb &= ~sel
        nb_comp = win[nb]
        nb_comp = nb_comp[(nb_comp >= 0) & (remap[nb_comp] >= 0)]
        if len(nb_comp):
            vals, counts = np.unique(nb_comp, return_counts=True)
            remap[comp_id] = remap[vals[np.argmax(counts)]]
        else:
            remap[comp_id] = out_next
            out_next += 1
    return (remap[comp] + start_label).astype(np.int64)
