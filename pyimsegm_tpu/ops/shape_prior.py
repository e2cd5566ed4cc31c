"""Shape priors for region growing: inverse-CDF ray tables + batched lookup.

The reference models object shape as per-angle cumulative distributions of
ray lengths (`/root/reference/imsegm/region_growing.py:334-361`) and evaluates
the prior one point at a time with a scipy 2x2 interpolation
(`region_growing.py:591-652`).  Here the table lookup is a single vectorized
bilinear gather over all points at once — the per-superpixel Python loop
(`region_growing.py:845-847`, the RG2Sp hot spot) becomes one fused XLA op.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def norm_cdf(x, mean, std):
    """Normal CDF via erf (device-friendly; no scipy.stats)."""
    return 0.5 * (1.0 + jax.scipy.special.erf((x - mean) / (std * np.sqrt(2.0))))


def compute_cumulative_distrib(means, stds, weights, max_dist):
    """Survival-function table of a ray-length mixture, per angle.

    Mirrors `region_growing.py:334-361`: for each ray direction, the weighted
    normal CDF mixture over distances 0..max_dist is min-max normalised and
    flipped to a survival function (+1e-9 floor).

    :param means: (J, A) component means per direction
    :param stds: (J, A) component stds per direction
    :param weights: (J,) component weights
    :returns: (A, D+1) numpy array
    """
    means = np.asarray(means, float)
    stds = np.asarray(stds, float)
    weights = np.asarray(weights, float)
    j = len(weights)
    samples = jnp.arange(int(max_dist) + 1, dtype=jnp.float32)
    # (J, A, D): one CDF per component per direction
    cdf = norm_cdf(samples[None, None, :], jnp.asarray(means[:j])[:, :, None],
                   jnp.asarray(stds[:j])[:, :, None])
    cdf = jnp.sum(jnp.asarray(weights)[:, None, None] * cdf, axis=0)  # (A, D)
    lo = jnp.min(cdf, axis=1, keepdims=True)
    hi = jnp.max(cdf, axis=1, keepdims=True)
    cdf = (cdf - lo) / (hi - lo)
    return np.asarray(1.0 - cdf + 1e-9)


@functools.partial(jax.jit, static_argnames=())
def shape_prior_points(points, cdf_table, centre, angle_shift):
    """Bilinear shape-prior lookup for a batch of points.

    Replicates `region_growing.py:591-652` exactly — angle measured as
    ``(90 - atan2(dy, dx) - shift) mod 360`` from the object centre, bilinear
    interpolation in the (angle, distance) table, last-column fallback for
    out-of-range distances — but for all points in one gather.

    :param points: (N, 2) float (row, col)
    :param cdf_table: (A, D) survival table
    :param centre: (2,) float
    :param angle_shift: scalar degrees
    :returns: (N,) float priors
    """
    table = jnp.asarray(cdf_table, jnp.float32)
    a, d = table.shape
    # wrap angle axis so interpolation between last and first row works
    table = jnp.concatenate([table, table[:1]], axis=0)          # (A+1, D)
    angle_step = 360.0 / a

    pts = jnp.asarray(points, jnp.float32)
    diff = pts - jnp.asarray(centre, jnp.float32)[None, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))
    angle = jnp.rad2deg(jnp.arctan2(diff[:, 1], diff[:, 0]))
    angle = (2.0 * 360.0 + 90.0 - angle - angle_shift) % 360.0
    angle_norm = angle / angle_step

    a0 = jnp.floor(angle_norm).astype(jnp.int32)
    a0 = jnp.clip(a0, 0, a - 1)
    d0 = jnp.floor(dist).astype(jnp.int32)
    d0c = jnp.clip(d0, 0, d - 2)
    fa = angle_norm - a0
    fd = dist - d0

    v00 = table[a0, d0c]
    v01 = table[a0, d0c + 1]
    v10 = table[a0 + 1, d0c]
    v11 = table[a0 + 1, d0c + 1]
    interp = (v00 * (1 - fa) * (1 - fd) + v10 * fa * (1 - fd)
              + v01 * (1 - fa) * fd + v11 * fa * fd)

    # distance beyond the table -> value of the last column at nearest angle
    a_round = jnp.clip(jnp.round(angle_norm).astype(jnp.int32), 0, a)
    far = table[a_round, d - 1]
    return jnp.where(dist >= (d - 1), far, interp)


def compute_shape_prior_table_cdf(point, cum_distribution, centre, angle_shift=0):
    """Scalar-compatible wrapper of :func:`shape_prior_points`
    (`region_growing.py:591-652`)."""
    out = shape_prior_points(
        jnp.asarray([point], jnp.float32), np.asarray(cum_distribution, float),
        jnp.asarray(centre, jnp.float32), float(angle_shift))
    return float(out[0])
