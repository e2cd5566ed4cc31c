"""Measure subset (connected components, region properties, model fitting)
for running the reference."""

import numpy as np
from scipy import ndimage

from . import fit  # noqa: F401


def label(image, background=0, connectivity=None, return_num=False):
    """Connected regions of equal value (skimage semantics: neighbours are
    connected iff they share the same value; ``background`` stays 0)."""
    image = np.asarray(image)
    conn = connectivity if connectivity is not None else image.ndim
    structure = ndimage.generate_binary_structure(image.ndim, conn)
    out = np.zeros(image.shape, np.int32)
    nxt = 1
    for val in np.unique(image):
        if background is not None and val == background:
            continue
        comp, n = ndimage.label(image == val, structure=structure)
        out[comp > 0] = comp[comp > 0] + (nxt - 1)
        nxt += n
    if return_num:
        return out, nxt - 1
    return out


class _RegionProps:
    def __init__(self, lbl, mask):
        self.label = lbl
        self._mask = mask
        ys, xs = np.nonzero(mask)
        self._ys, self._xs = ys, xs

    def __getitem__(self, key):
        return getattr(self, key)

    @property
    def area(self):
        return len(self._ys)

    @property
    def centroid(self):
        return (self._ys.mean(), self._xs.mean())

    @property
    def bbox(self):
        return (int(self._ys.min()), int(self._xs.min()),
                int(self._ys.max()) + 1, int(self._xs.max()) + 1)

    @property
    def _central_moments(self):
        dy = self._ys - self._ys.mean()
        dx = self._xs - self._xs.mean()
        return (dy * dy).mean(), (dx * dx).mean(), (dy * dx).mean()

    @property
    def orientation(self):
        """Angle of the major axis vs the row axis, in (-pi/2, pi/2]
        (skimage convention)."""
        muyy, muxx, muxy = self._central_moments
        if muyy == muxx:
            return np.pi / 4.0 if muxy > 0 else -np.pi / 4.0
        return 0.5 * np.arctan2(2.0 * muxy, muyy - muxx) * -1.0

    @property
    def major_axis_length(self):
        muyy, muxx, muxy = self._central_moments
        common = np.sqrt((muyy - muxx) ** 2 + 4 * muxy ** 2)
        return float(np.sqrt(8.0 * max(muyy + muxx + common, 0.0)))

    @property
    def minor_axis_length(self):
        muyy, muxx, muxy = self._central_moments
        common = np.sqrt((muyy - muxx) ** 2 + 4 * muxy ** 2)
        return float(np.sqrt(8.0 * max(muyy + muxx - common, 0.0)))

    @property
    def eccentricity(self):
        a, b = self.major_axis_length / 2.0, self.minor_axis_length / 2.0
        if a == 0:
            return 0.0
        return float(np.sqrt(1.0 - (b / a) ** 2))

    @property
    def image(self):
        r0, c0, r1, c1 = self.bbox
        return self._mask[r0:r1, c0:c1]

    @property
    def coords(self):
        return np.stack([self._ys, self._xs], axis=1)


def regionprops(label_image, **_kw):
    label_image = np.asarray(label_image)
    return [_RegionProps(int(lb), label_image == lb)
            for lb in np.unique(label_image) if lb != 0]
