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
    _legacy_pandas_append()
