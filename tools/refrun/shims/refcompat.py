"""Runtime-compatibility patches for executing the reference
(`/root/reference`, written against ~2021 numpy/scipy/pandas/sklearn) on
this image's current libraries.  Import and call :func:`install` *before*
importing any ``imsegm`` module.

Each patch restores exactly one removed legacy surface; nothing here
changes numerical behaviour.
"""

import sys
import types

import numpy as np


def _legacy_scipy_submodules():
    """Re-create the flat ``scipy.ndimage.<group>`` namespaces removed in
    scipy 1.10+ (`filters`, `morphology`, `measurements`, `interpolation`)
    as alias modules forwarding to ``scipy.ndimage``."""
    import scipy.ndimage as ndi

    groups = {
        'filters': (
            'gaussian_filter', 'gaussian_filter1d', 'gaussian_laplace',
            'median_filter', 'uniform_filter', 'maximum_filter',
            'minimum_filter', 'convolve', 'correlate', 'sobel', 'laplace',
        ),
        'morphology': (
            'binary_fill_holes', 'binary_erosion', 'binary_dilation',
            'binary_opening', 'binary_closing', 'distance_transform_edt',
            'grey_erosion', 'grey_dilation', 'grey_opening', 'grey_closing',
        ),
        'measurements': (
            'label', 'center_of_mass', 'find_objects', 'sum', 'mean',
            'maximum_position', 'minimum_position',
        ),
        'interpolation': (
            'shift', 'rotate', 'zoom', 'affine_transform', 'map_coordinates',
        ),
    }
    for group, names in groups.items():
        mod_name = 'scipy.ndimage.%s' % group
        if mod_name in sys.modules:
            continue
        mod = types.ModuleType(mod_name)
        for name in names:
            if hasattr(ndi, name):
                setattr(mod, name, getattr(ndi, name))
        sys.modules[mod_name] = mod
        setattr(ndi, group, mod)


def _legacy_scipy_interp():
    import scipy
    if not hasattr(scipy, 'interp'):
        scipy.interp = np.interp


def _legacy_numpy_aliases():
    for name, py in (('float', float), ('int', int), ('bool', bool),
                     ('object', object), ('str', str), ('complex', complex)):
        if not hasattr(np, name):
            setattr(np, name, py)
    for name, val in (('Inf', np.inf), ('Infinity', np.inf), ('NaN', np.nan),
                      ('NAN', np.nan), ('NINF', -np.inf), ('PINF', np.inf)):
        if not hasattr(np, name):
            setattr(np, name, val)


def _legacy_scipy_interp2d():
    """`scipy.interpolate.interp2d` was removed in scipy 1.14.  The
    reference only uses it for a bilinear lookup on a 2x2 patch of the
    shape-prior table (`imsegm/region_growing.py:644-649`), passing the
    grid as flattened scattered (x, y, z) triples; this stand-in
    reproduces exactly that (linear interpolation over a rectangular
    scattered grid)."""
    import scipy.interpolate as si
    try:
        # modern scipy keeps a stub that raises NotImplementedError
        si.interp2d([0., 1.], [0., 1.], [[0., 0.], [0., 0.]])
        return                                   # real implementation exists
    except NotImplementedError:
        pass
    except TypeError:
        return

    class interp2d:
        def __init__(self, x, y, z, kind='linear', **_kw):
            x = np.asarray(x, float).ravel()
            y = np.asarray(y, float).ravel()
            z = np.asarray(z, float).ravel()
            self._xs = np.unique(x)
            self._ys = np.unique(y)
            grid = np.empty((len(self._ys), len(self._xs)))
            for xi, yi, zi in zip(x, y, z):
                grid[np.searchsorted(self._ys, yi),
                     np.searchsorted(self._xs, xi)] = zi
            self._grid = grid

        def __call__(self, x, y):
            x = np.atleast_1d(np.asarray(x, float))
            y = np.atleast_1d(np.asarray(y, float))
            xs, ys, g = self._xs, self._ys, self._grid
            i = np.clip(np.searchsorted(xs, x) - 1, 0, len(xs) - 2)
            j = np.clip(np.searchsorted(ys, y) - 1, 0, len(ys) - 2)
            fx = np.clip((x - xs[i]) / np.maximum(xs[i + 1] - xs[i], 1e-12),
                         0.0, 1.0)
            fy = np.clip((y - ys[j]) / np.maximum(ys[j + 1] - ys[j], 1e-12),
                         0.0, 1.0)
            v = (g[j, i] * (1 - fx) * (1 - fy) + g[j, i + 1] * fx * (1 - fy)
                 + g[j + 1, i] * (1 - fx) * fy + g[j + 1, i + 1] * fx * fy)
            return v

    si.interp2d = interp2d


def _legacy_pandas_append():
    import pandas as pd
    if hasattr(pd.DataFrame, 'append'):
        return

    def _append(self, other, ignore_index=False, **_kw):
        if isinstance(other, dict):
            other = pd.DataFrame([other])
        elif isinstance(other, pd.Series):
            other = other.to_frame().T
        frames = [f for f in (self, other) if len(f)]
        if not frames:
            return self.copy()
        return pd.concat(frames, ignore_index=ignore_index)

    pd.DataFrame.append = _append


def install():
    _legacy_numpy_aliases()
    _legacy_scipy_submodules()
    _legacy_scipy_interp()
    _legacy_scipy_interp2d()
    _legacy_pandas_append()
