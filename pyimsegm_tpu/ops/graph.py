"""Superpixel adjacency graphs with static (padded) edge lists.

The reference builds Python edge lists by hashing neighbor pairs
(`/root/reference/imsegm/superpixels.py:115-203`).  On TPU the edge list must
be shape-static: we hash conn4/conn6 neighboring label pairs, run
``jnp.unique(..., size=E_MAX)`` (jit-compatible with a fill sentinel) and keep
a boolean validity mask.  For a planar region adjacency graph E <= 3K-6, so
``E_MAX = 4*K`` never truncates in practice.
"""


import jax
import jax.numpy as jnp


def edge_capacity(num_segments):
    """Static padded edge count.  A connectivity-enforced region adjacency
    graph is planar (E <= 3K-6), but raw SLIC labels can fragment on noisy
    images and exceed it; 8x gives headroom against silent truncation."""
    return 8 * num_segments


def adjacency_edges_2d(labels, num_segments):
    """conn4 region adjacency from a 2D label map.

    :param labels: (H, W) int32 in [0, num_segments)
    :returns: (edges (E_MAX, 2) int32 sorted pairs, valid (E_MAX,) bool);
        invalid slots hold (0, 0).
    """
    a = jnp.concatenate([labels[:, :-1].ravel(), labels[:-1, :].ravel()])
    b = jnp.concatenate([labels[:, 1:].ravel(), labels[1:, :].ravel()])
    return _unique_edges(a, b, num_segments)


def adjacency_edges_3d(labels, num_segments):
    """conn6 region adjacency from a 3D label volume."""
    a = jnp.concatenate([labels[:, :, :-1].ravel(), labels[:, :-1, :].ravel(),
                         labels[:-1, :, :].ravel()])
    b = jnp.concatenate([labels[:, :, 1:].ravel(), labels[:, 1:, :].ravel(),
                         labels[1:, :, :].ravel()])
    return _unique_edges(a, b, num_segments)


def _unique_edges(a, b, num_segments):
    lo = jnp.minimum(a, b).astype(jnp.int32)
    hi = jnp.maximum(a, b).astype(jnp.int32)
    k = num_segments
    sentinel = k * k
    h = jnp.where(lo == hi, sentinel, lo * k + hi)
    e_max = edge_capacity(k)
    uniq = jnp.unique(h, size=e_max, fill_value=sentinel)
    valid = uniq < sentinel
    uniq = jnp.where(valid, uniq, 0)
    edges = jnp.stack([uniq // k, uniq % k], axis=-1)
    return edges, valid


def superpixel_centers(labels, num_segments, ndim=2):
    """Mean pixel coordinate per superpixel (reference regionprops centroid,
    `superpixels.py:205`); empty segments get 0."""
    shape = labels.shape
    coords = [jax.lax.broadcasted_iota(jnp.float32, shape, d).ravel()
              for d in range(ndim)]
    data = jnp.stack(coords + [jnp.ones(labels.size, jnp.float32)], axis=-1)
    sums = jax.ops.segment_sum(data, labels.ravel(), num_segments=num_segments)
    return sums[:, :ndim] / jnp.maximum(sums[:, ndim:], 1.0)


def compute_spatial_dist(centers, edges, valid, relative=False):
    """Euclidean distance between adjacent superpixel centres
    (`graph_cuts.py:303-336`); with ``relative=True`` normalised by the mean
    distance over valid edges."""
    d = centers[edges[:, 0]] - centers[edges[:, 1]]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    if relative:
        mean = jnp.sum(dist * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        dist = dist / jnp.maximum(mean, 1e-12)
    return dist


def _masked_std(x, valid):
    n = jnp.maximum(jnp.sum(valid), 1.0)
    m = jnp.sum(x * valid) / n
    var = jnp.sum(((x - m) ** 2) * valid) / n
    return jnp.sqrt(var)


def edge_model_weights(edges, valid, proba, metric='lT'):
    """Model-driven edge weights ``exp(-dist / (2*std(dist)**2))``
    (`graph_cuts.py:383-439`); metric in {'l1','l2','lT'}."""
    v1 = proba[edges[:, 0]]
    v2 = proba[edges[:, 1]]
    if metric == 'l1':
        dist = jnp.sum(jnp.abs(v1 - v2), axis=-1)
    elif metric == 'l2':
        dist = jnp.sqrt(jnp.sum((v1 - v2) ** 2, axis=-1))
    elif metric == 'lT':
        dist = jnp.max((v1 - v2) ** 2, axis=-1)
    else:
        raise ValueError('unknown edge model metric: %r' % metric)
    std = _masked_std(dist, valid)
    return jnp.exp(-dist / jnp.maximum(2.0 * std ** 2, 1e-12))


def edge_vector_weights(edges, valid, vectors, metric):
    """'color' (manhattan) / 'features' (euclidean) edge weights with the
    reference scaling ``exp(-dist / (2*std(dist)**2))``
    (`graph_cuts.py:622-642`)."""
    v1 = vectors[edges[:, 0]]
    v2 = vectors[edges[:, 1]]
    if metric == 'l1':
        dist = jnp.sum(jnp.abs(v1 - v2), axis=-1)
    else:
        dist = jnp.sqrt(jnp.sum((v1 - v2) ** 2, axis=-1))
    std = _masked_std(dist, valid)
    return jnp.exp(-dist / jnp.maximum(2.0 * std ** 2, 1e-12))
