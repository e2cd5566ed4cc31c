"""Morphology subset (scipy.ndimage-backed) for running the reference."""

import numpy as np
from scipy import ndimage


def disk(radius, dtype=np.uint8):
    r = int(radius)
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    return (yy * yy + xx * xx <= r * r).astype(dtype)


def square(width, dtype=np.uint8):
    return np.ones((int(width), int(width)), dtype)


def opening(image, footprint=None):
    image = np.asarray(image)
    if footprint is None:
        footprint = square(3)
    footprint = np.asarray(footprint).astype(bool)
    if image.dtype == bool:
        return ndimage.binary_opening(image, structure=footprint)
    return ndimage.grey_opening(image, footprint=footprint)


def closing(image, footprint=None):
    image = np.asarray(image)
    if footprint is None:
        footprint = square(3)
    footprint = np.asarray(footprint).astype(bool)
    if image.dtype == bool:
        return ndimage.binary_closing(image, structure=footprint)
    return ndimage.grey_closing(image, footprint=footprint)


def erosion(image, footprint=None):
    image = np.asarray(image)
    if footprint is None:
        footprint = square(3)
    footprint = np.asarray(footprint).astype(bool)
    if image.dtype == bool:
        return ndimage.binary_erosion(image, structure=footprint)
    return ndimage.grey_erosion(image, footprint=footprint)


def dilation(image, footprint=None):
    image = np.asarray(image)
    if footprint is None:
        footprint = square(3)
    footprint = np.asarray(footprint).astype(bool)
    if image.dtype == bool:
        return ndimage.binary_dilation(image, structure=footprint)
    return ndimage.grey_dilation(image, footprint=footprint)


def binary_fill_holes(image, structure=None):
    return ndimage.binary_fill_holes(np.asarray(image), structure=structure)


def label(image, connectivity=None):
    structure = ndimage.generate_binary_structure(
        np.asarray(image).ndim, connectivity or 1)
    lbl, _ = ndimage.label(image, structure=structure)
    return lbl
