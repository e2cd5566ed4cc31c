"""Superpixel API matching `imsegm.superpixels`
(`/root/reference/imsegm/superpixels.py`).

The device kernels live in `pyimsegm_tpu.ops.slic` / `ops.graph`; this module
exposes them under the reference's names and adds the host-side edge-list
helpers the reference provides.
"""

import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops import graph as graph_ops
from pyimsegm_tpu.ops.slic import (  # noqa: F401  (public re-export)
    segment_slic_img2d,
)
from pyimsegm_tpu.ops.slic3d import (  # noqa: F401
    segment_slic_img3d_gray,
)


def get_segment_diffs_2d_conn4(grid):
    """Coordinate pairs of conn4 neighbouring labels
    (`superpixels.py:134-154`): returns the (a, b) label pairs of all
    horizontally/vertically adjacent pixels."""
    grid = np.asarray(grid)
    a = np.concatenate([grid[:, :-1].ravel(), grid[:-1, :].ravel()])
    b = np.concatenate([grid[:, 1:].ravel(), grid[1:, :].ravel()])
    return np.stack([a, b], axis=1)


def get_segment_diffs_3d_conn6(grid):
    """conn6 3D variant (`superpixels.py:157-178`)."""
    grid = np.asarray(grid)
    a = np.concatenate([grid[:, :, :-1].ravel(), grid[:, :-1, :].ravel(),
                        grid[:-1, :, :].ravel()])
    b = np.concatenate([grid[:, :, 1:].ravel(), grid[:, 1:, :].ravel(),
                        grid[1:, :, :].ravel()])
    return np.stack([a, b], axis=1)


def make_graph_segment_connect_edges(vertices, all_edges):
    """Unique undirected edges from raw pairs (`superpixels.py:115-131`)."""
    all_edges = np.asarray(all_edges)
    all_edges = all_edges[all_edges[:, 0] != all_edges[:, 1]]
    all_edges = np.sort(all_edges, axis=1)
    edges = np.unique(all_edges, axis=0)
    return vertices, edges


def make_graph_segm_connect_grid2d_conn4(grid):
    """(vertices, edges) superpixel adjacency of a 2D label map
    (`superpixels.py:157-177`)."""
    grid = np.asarray(grid)
    vertices = np.unique(grid)
    return make_graph_segment_connect_edges(
        vertices, get_segment_diffs_2d_conn4(grid))


def make_graph_segm_connect_grid3d_conn6(grid):
    """(vertices, edges) for a 3D label volume (`superpixels.py:180-202`)."""
    grid = np.asarray(grid)
    vertices = np.unique(grid)
    return make_graph_segment_connect_edges(
        vertices, get_segment_diffs_3d_conn6(grid))


def superpixel_centers(segments):
    """Mean coordinate per superpixel (`superpixels.py:205-242`)."""
    segments = np.asarray(segments)
    k = int(segments.max()) + 1
    centers = graph_ops.superpixel_centers(jnp.asarray(segments), k,
                                           ndim=segments.ndim)
    return np.asarray(centers)


def get_neighboring_segments(edges):
    """Edge list -> per-node neighbour lists (`superpixels.py:245-258`)."""
    from pyimsegm_tpu.region_growing import get_neighboring_segments as _gns
    return _gns(edges)
