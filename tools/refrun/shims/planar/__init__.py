"""Minimal `planar` stand-in for running the reference.

The reference imports ``planar.line.Line`` in exactly one place
(`/root/reference/imsegm/utilities/drawing.py:20,620`) and uses only
``Line(point, direction).project(point)`` — orthogonal projection of a
point onto an infinite line.  That is three lines of numpy.
"""

from . import line  # noqa: F401
