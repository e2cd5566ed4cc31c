"""Utilities: IO, metrics, experiment harness, sample-data registry."""


class ImageDimensionError(TypeError):
    """Raised when image/annotation dimensions disagree (parity with
    `/root/reference/imsegm/utilities/__init__.py:39`)."""
