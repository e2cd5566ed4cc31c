"""ctypes bindings for the native C++ runtime components.

Builds ``libimsegm_native.so`` lazily with the bundled Makefile on first use;
every entry point has a pure-numpy fallback so the package works without a
C++ toolchain (mirroring the reference's ``USE_CYTHON`` runtime toggle,
`/root/reference/imsegm/descriptors.py:25-33`).
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libimsegm_native.so')
_LIB = None
_TRIED = False

#: runtime toggle, like the reference USE_CYTHON
USE_NATIVE = os.environ.get('PYIMSEGM_USE_NATIVE', '1') != '0'


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED or not USE_NATIVE:
        return _LIB
    _TRIED = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as exc:  # pragma: no cover - toolchain missing
            logging.warning('native build failed (%s); using numpy fallbacks', exc)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:  # pragma: no cover
        logging.warning('native load failed (%s); using numpy fallbacks', exc)
        return None
    lib.enforce_connectivity_2d.restype = ctypes.c_int
    lib.enforce_connectivity_2d.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.alpha_expansion.restype = ctypes.c_double
    lib.alpha_expansion.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def has_native():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def enforce_connectivity(labels, min_size=16):
    """Relabel so every output label is one conn4-connected component; merge
    fragments smaller than ``min_size`` into a visited neighbor component.

    :returns: int32 label map (label count may differ from the input's)
    """
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = labels.shape
    out = np.empty_like(labels)
    lib = _load()
    if lib is not None:
        lib.enforce_connectivity_2d(_ptr(labels, ctypes.c_int32), h, w,
                                    int(min_size), _ptr(out, ctypes.c_int32))
        return out
    return _enforce_connectivity_numpy(labels, min_size)


def _enforce_connectivity_numpy(labels, min_size):
    """Twin of the C++ kernel (same skimage semantics): components relabel
    sequentially in raster order of their first pixel; fragments below
    ``min_size`` merge into the most-contact already-relabelled adjacent
    component (contact = distinct adjacent cells, ties to the smallest
    output label)."""
    from scipy import ndimage
    h, w = labels.shape
    comp = np.full((h, w), -1, np.int64)
    nxt = 0
    sizes, first_px, bboxes = [], [], []
    for lb in np.unique(labels):
        cc, _n = ndimage.label(labels == lb)
        for ci, sl in enumerate(ndimage.find_objects(cc), start=1):
            sub = cc[sl] == ci
            comp[sl][sub] = nxt
            sizes.append(int(sub.sum()))
            ys, xs = np.nonzero(sub)
            o = np.lexsort((xs, ys))[0]
            first_px.append((sl[0].start + int(ys[o]),
                             sl[1].start + int(xs[o])))
            bboxes.append(sl)
            nxt += 1
    sizes = np.asarray(sizes)

    order = np.argsort([fy * w + fx for fy, fx in first_px], kind='stable')
    remap = np.full(nxt, -1, np.int64)
    out_next = 0
    for comp_id in order:
        if sizes[comp_id] >= min_size or out_next == 0:
            remap[comp_id] = out_next
            out_next += 1
            continue
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
        nb_out = remap[np.maximum(win[nb], 0)]
        nb_out = nb_out[(win[nb] >= 0) & (nb_out >= 0)]
        if len(nb_out):
            vals, counts = np.unique(nb_out, return_counts=True)
            remap[comp_id] = vals[np.argmax(counts)]
        else:
            remap[comp_id] = out_next
            out_next += 1
    return remap[comp].astype(np.int32)


def alpha_expansion(edges, weights, unary, pairwise, init_labels=None,
                    n_iter=-1):
    """Exact multi-label MRF minimisation (host oracle).

    :param edges: (E, 2) int array
    :param weights: (E,) float
    :param unary: (N, C) float costs
    :param pairwise: (C, C) float costs
    :returns: (labels (N,) int32, energy float)
    """
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    unary = np.ascontiguousarray(unary, dtype=np.float64)
    pairwise = np.ascontiguousarray(pairwise, dtype=np.float64)
    n, c = unary.shape
    labels = (np.argmin(unary, axis=1).astype(np.int32)
              if init_labels is None
              else np.ascontiguousarray(init_labels, dtype=np.int32).copy())
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable; alpha_expansion '
                           'requires the C++ backend (set PYIMSEGM_USE_NATIVE=1 '
                           'and ensure g++/make exist)')
    energy = lib.alpha_expansion(
        n, len(edges), c, _ptr(edges, ctypes.c_int32),
        _ptr(weights, ctypes.c_double), _ptr(unary, ctypes.c_double),
        _ptr(pairwise, ctypes.c_double), int(n_iter),
        _ptr(labels, ctypes.c_int32))
    return labels, float(energy)
