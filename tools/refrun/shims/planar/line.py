import numpy as np


class Line(object):
    """Infinite line through ``anchor`` with direction ``direction``."""

    def __init__(self, anchor, direction):
        self._anchor = np.asarray(anchor, dtype=float)
        self._dir = np.asarray(direction, dtype=float)

    def project(self, point):
        d = self._dir
        denom = float(d @ d)
        if denom == 0.0:
            return tuple(self._anchor)
        t = float((np.asarray(point, dtype=float) - self._anchor) @ d) / denom
        return tuple(self._anchor + t * d)
