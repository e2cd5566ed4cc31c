"""Minimal `skimage` stand-in for running the reference (`/root/reference`)
on a machine without scikit-image.

Only the surface the reference's unsupervised/supervised/RG2Sp pipelines
actually touch is provided (see `tools/refrun/README.md`); everything is
plain numpy/scipy written from scratch — no scikit-image code.
"""

from . import (  # noqa: F401
    color,
    draw,
    exposure,
    filters,
    io,
    measure,
    morphology,
    segmentation,
)

__version__ = '0.0-refrun-shim'
