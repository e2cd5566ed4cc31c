"""Ellipse models + segmentation-criterion RANSAC.

TPU-native re-design of `/root/reference/imsegm/ellipse_fitting.py`: the
ellipse estimate is a direct (Halir-Flusser) conic least squares — a tiny
host eigenproblem — while everything O(N) runs batched on device: the
inside-ellipse test and area-likelihood criterion over all points
(`ellipse_fitting.py:76-139`), residual distances (dense parametric sampling
instead of scipy per-point Newton projection), and the RANSAC trial scoring
(`ellipse_fitting.py:142-261`).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.ops.ray import (
    compute_ray_features_segm_2d,
    reconstruct_ray_features_2d,
    reduce_close_points,
)

#: minimal expected ellipse diameter (`ellipse_fitting.py:19`)
MIN_ELLIPSE_DAIM = 25.
#: background smoothing structure element size (`ellipse_fitting.py:24`)
STRUC_ELEM_BG = 15
#: foreground smoothing structure element size (`ellipse_fitting.py:26`)
STRUC_ELEM_FG = 5


# ------------------------------------------------------------ geometry -----

def ellipse_inside_mask(points, params):
    """(N,) bool: points inside the ellipse ``(xc, yc, a, b, theta)``."""
    xc, yc, a, b, phi = params
    pts = np.asarray(points, float)
    r = pts[:, 0] - xc
    c = pts[:, 1] - yc
    d1 = ((r * np.cos(phi) + c * np.sin(phi)) / a) ** 2
    d2 = ((r * np.sin(phi) - c * np.cos(phi)) / b) ** 2
    return (d1 + d2) <= 1


def ellipse_fill_coords(c1, c2, a, b, phi, shape=None):
    """Row/col coordinates of ellipse interior pixels (equivalent of the
    reference ``drawing.ellipse`` rasteriser, `drawing.py:116-151`)."""
    rad = int(np.ceil(max(a, b)))
    r0, c0 = int(round(c1)), int(round(c2))
    rr, cc = np.meshgrid(np.arange(r0 - rad, r0 + rad + 1),
                         np.arange(c0 - rad, c0 + rad + 1), indexing='ij')
    pts = np.stack([rr.ravel(), cc.ravel()], axis=1)
    inside = ellipse_inside_mask(pts, (c1, c2, a, b, phi))
    rr, cc = pts[inside, 0], pts[inside, 1]
    if shape is not None:
        ok = (rr >= 0) & (rr < shape[0]) & (cc >= 0) & (cc < shape[1])
        rr, cc = rr[ok], cc[ok]
    return rr, cc


def ellipse_perimeter_coords(c1, c2, a, b, phi, nb=720, shape=None):
    """Integer perimeter coordinates via dense parametric sampling."""
    t = np.linspace(0, 2 * np.pi, nb, endpoint=False)
    rr = np.round(c1 + a * np.cos(phi) * np.cos(t)
                  - b * np.sin(phi) * np.sin(t)).astype(int)
    cc = np.round(c2 + a * np.sin(phi) * np.cos(t)
                  + b * np.cos(phi) * np.sin(t)).astype(int)
    if shape is not None:
        ok = (rr >= 0) & (rr < shape[0]) & (cc >= 0) & (cc < shape[1])
        rr, cc = rr[ok], cc[ok]
    return rr, cc


def _fit_conic(points):
    """Numerically-stable direct ellipse LSQ (Halir & Flusser 1998).

    :returns: (xc, yc, a, b, theta) or None when degenerate
    """
    pts = np.asarray(points, float)
    if len(pts) < 5:
        return None
    x = pts[:, 0]
    y = pts[:, 1]
    # center data for conditioning
    mx, my = x.mean(), y.mean()
    x = x - mx
    y = y - my
    d1 = np.stack([x * x, x * y, y * y], axis=1)
    d2 = np.stack([x, y, np.ones_like(x)], axis=1)
    s1 = d1.T @ d1
    s2 = d1.T @ d2
    s3 = d2.T @ d2
    try:
        t_mat = -np.linalg.solve(s3, s2.T)
    except np.linalg.LinAlgError:
        return None
    m = s1 + s2 @ t_mat
    m_red = np.array([m[2] / 2.0, -m[1], m[0] / 2.0])
    try:
        evals, evecs = np.linalg.eig(m_red)
    except np.linalg.LinAlgError:
        return None
    cond = 4 * evecs[0] * evecs[2] - evecs[1] ** 2
    ok = np.where(np.isreal(evals) & (cond > 0))[0]
    if len(ok) == 0:
        return None
    a1 = np.real(evecs[:, ok[0]])
    a2 = t_mat @ a1
    av, bv, cv = a1
    dv, ev, fv = a2

    den = bv * bv - 4 * av * cv
    if den >= 0:
        return None
    xc = (2 * cv * dv - bv * ev) / den
    yc = (2 * av * ev - bv * dv) / den
    num = 2 * (av * ev * ev + cv * dv * dv + fv * bv * bv
               - bv * dv * ev - 4 * av * cv * fv)
    root = np.sqrt((av - cv) ** 2 + bv * bv)
    major = -np.sqrt(max(num * (av + cv + root), 0)) / den
    minor = -np.sqrt(max(num * (av + cv - root), 0)) / den
    if major <= 0 or minor <= 0:
        return None
    # canonical form: first radius = major axis, theta = its direction
    if bv == 0:
        theta = 0.0 if av < cv else np.pi / 2
    else:
        theta = np.arctan2(cv - av - root, bv)
    return np.array([xc + mx, yc + my, major, minor, theta])


@functools.partial(jax.jit, static_argnames=())
def _criterion_batch(params, points, weights, labels, table_q):
    """Area-likelihood criterion for a batch of ellipses at once.

    :param params: (T, 5) ellipse parameter rows
    :param points: (N, 2); weights: (W,); labels: (N,); table_q: (2, L)
    :returns: (T,) criteria
    """
    pts = jnp.asarray(points, jnp.float32)
    lab = jnp.asarray(labels, jnp.int32)
    diff_l = table_q[0] - table_q[1]                        # (L,)
    # NB: the reference weights by ``weights[label]`` (label-indexed), not by
    # point index (`ellipse_fitting.py:136-137`) — replicated for parity.
    contrib = jnp.asarray(weights, jnp.float32)[lab] * diff_l[lab]   # (N,)

    def one(p):
        xc, yc, a, b, phi = p[0], p[1], p[2], p[3], p[4]
        r = pts[:, 0] - xc
        c = pts[:, 1] - yc
        d1 = ((r * jnp.cos(phi) + c * jnp.sin(phi)) / a) ** 2
        d2 = ((r * jnp.sin(phi) - c * jnp.cos(phi)) / b) ** 2
        inside = (d1 + d2) <= 1
        return jnp.sum(jnp.where(inside, contrib, 0.0))

    return jax.vmap(one)(jnp.asarray(params, jnp.float32))


@functools.partial(jax.jit, static_argnames=('nb_t',))
def _residual_dist(params, points, nb_t=720):
    """Min distance from each point to a dense parametric sampling of the
    ellipse — vectorized stand-in for the per-point Newton projection."""
    xc, yc, a, b, phi = (params[0], params[1], params[2], params[3], params[4])
    t = jnp.linspace(0, 2 * jnp.pi, nb_t, endpoint=False)
    er = xc + a * jnp.cos(phi) * jnp.cos(t) - b * jnp.sin(phi) * jnp.sin(t)
    ec = yc + a * jnp.sin(phi) * jnp.cos(t) + b * jnp.cos(phi) * jnp.sin(t)
    pts = jnp.asarray(points, jnp.float32)
    d2 = ((pts[:, 0:1] - er[None, :]) ** 2 + (pts[:, 1:2] - ec[None, :]) ** 2)
    return jnp.sqrt(jnp.min(d2, axis=1))


class EllipseModelSegm:
    """Direct-LSQ ellipse with a segmentation likelihood criterion
    (`ellipse_fitting.py:29-139`).  ``params = (xc, yc, a, b, theta)``."""

    def __init__(self):
        self.params = None

    def estimate(self, points):
        params = _fit_conic(points)
        if params is None:
            return False
        self.params = params
        return True

    def predict_xy(self, t, params=None):
        if params is None:
            params = self.params
        xc, yc, a, b, phi = params
        t = np.asarray(t)
        xt = xc + a * np.cos(phi) * np.cos(t) - b * np.sin(phi) * np.sin(t)
        yt = yc + a * np.sin(phi) * np.cos(t) + b * np.cos(phi) * np.sin(t)
        return np.stack([xt, yt], axis=-1)

    def residuals(self, points):
        return np.asarray(_residual_dist(
            jnp.asarray(self.params, jnp.float32),
            jnp.asarray(points, jnp.float32)))

    def criterion(self, points, weights, labels, table_prob=(0.1, 0.9)):
        """Σ_inside w_label * (−log p_fg + log p_bg)
        (`ellipse_fitting.py:76-139`); negative favours the ellipse."""
        if not len(points) == len(weights) == len(labels):
            raise ValueError(
                'different sizes for points %i and weights %i and labels %i'
                % (len(points), len(weights), len(labels)))
        table_prob = np.array(table_prob, float)
        if 1 in (table_prob.ndim, table_prob.shape[0]):
            if table_prob.shape[0] == 1:
                table_prob = table_prob[0]
            table_prob = np.array([table_prob, 1. - table_prob])
        if table_prob.shape[0] != 2:
            raise ValueError('table shape %r' % table_prob.shape)
        if np.max(labels) >= table_prob.shape[1]:
            raise ValueError('labels (%i) exceed the table %r'
                             % (np.max(labels), table_prob.shape))
        table_q = jnp.asarray(-np.log(table_prob), jnp.float32)
        out = _criterion_batch(
            jnp.asarray(np.asarray(self.params)[None], jnp.float32),
            np.asarray(points, float), np.asarray(weights, float),
            np.asarray(labels, int), table_q)
        return float(out[0])


def ransac_segm(points, model_class, points_all, weights, labels, table_prob,
                min_samples, residual_threshold=1, max_trials=100):
    """RANSAC selecting by the segmentation criterion, not inlier count
    (`ellipse_fitting.py:142-261`).

    All trial ellipses are fitted host-side (tiny 3x3 eigenproblems) and
    scored in ONE batched device call over ``points_all``.

    :returns: (best model, inlier bool mask)
    """
    if isinstance(min_samples, float):
        if not 0 < min_samples <= 1:
            raise ValueError('`min_samples` as ratio must be in range (0, 1]')
        min_samples = int(min_samples * len(points))
    if not 0 < min_samples <= len(points):
        raise ValueError('`min_samples` must be in range (0, <nb-samples>]')
    if max_trials < 0:
        raise ValueError('`max_trials` must be greater than zero')

    points = np.array(points)
    table_prob_arr = np.array(table_prob, float)
    if 1 in (table_prob_arr.ndim, table_prob_arr.shape[0]):
        if table_prob_arr.shape[0] == 1:
            table_prob_arr = table_prob_arr[0]
        table_prob_arr = np.array([table_prob_arr, 1. - table_prob_arr])
    table_q = jnp.asarray(-np.log(table_prob_arr), jnp.float32)

    trial_params, trial_idx = [], []
    for _ in range(max_trials):
        random_idxs = np.random.choice(len(points), min_samples, replace=False)
        params = _fit_conic(points[random_idxs])
        if params is None:
            continue
        trial_params.append(params)
        trial_idx.append(random_idxs)
    if not trial_params:
        return None, None

    fits = np.asarray(_criterion_batch(
        np.asarray(trial_params, np.float32), np.asarray(points_all, float),
        np.asarray(weights, float), np.asarray(labels, int), table_q))

    best_model = None
    best_inlier_num = 0
    best_model_fit = np.inf
    best_inliers = None
    for params, model_fit in zip(trial_params, fits):
        if model_fit >= best_model_fit:
            continue
        model = model_class()
        model.params = params
        best_model = model
        best_model_fit = model_fit
        inliers = np.abs(model.residuals(points)) < residual_threshold
        n_in = int(np.sum(inliers))
        if n_in > best_inlier_num:
            best_inliers = inliers
            best_inlier_num = n_in

    if best_inliers is not None:
        best_model.estimate(points[best_inliers])
    return best_model, best_inliers


# --------------------------------------------------------- boundary prep ---

def get_slic_points_labels(segm, img=None, slic_size=20, slic_regul=0.1):
    """SLIC + centres + per-centre segmentation label
    (`ellipse_fitting.py:264-279`)."""
    from pyimsegm_tpu.ops import graph as graph_ops
    from pyimsegm_tpu.ops.slic import segment_slic_img2d
    segm = np.asarray(segm)
    if img is None:
        img = segm / float(max(segm.max(), 1))
    slic = np.asarray(segment_slic_img2d(img, sp_size=slic_size,
                                         relative_compact=slic_regul))
    k = int(slic.max()) + 1
    centers = np.asarray(graph_ops.superpixel_centers(
        jnp.asarray(slic), k)).astype(int)
    labels = segm[centers[:, 0], centers[:, 1]]
    return slic, centers, labels


def add_overlap_ellipse(segm, ellipse_params, label, thr_overlap=1.):
    """Rasterise an ellipse into the instance map unless it overlaps an
    existing object by more than ``thr_overlap`` of the smaller one
    (`ellipse_fitting.py:282-349`)."""
    if ellipse_params is None or len(ellipse_params) == 0:
        return segm
    segm = np.asarray(segm)
    c1, c2, h, w, phi = ellipse_params
    rr, cc = ellipse_fill_coords(int(c1), int(c2), int(h), int(w), phi,
                                 shape=segm.shape)
    mask = np.zeros(segm.shape, bool)
    mask[rr, cc] = True
    for lb in range(1, int(np.max(segm) + 1)):
        overlap = np.sum((segm == lb) & mask)
        sizes = [s for s in [np.sum(segm == lb), np.sum(mask)] if s > 0]
        if not sizes:
            return segm
        if float(overlap) / min(sizes) > thr_overlap:
            return segm
    segm = segm.copy()
    segm[mask] = label
    return segm


def split_segm_background_foreground(seg, sel_bg=STRUC_ELEM_BG,
                                     sel_fg=STRUC_ELEM_FG):
    """Morphologically smoothed (background, foreground) masks
    (`ellipse_fitting.py:400-443`)."""
    from scipy import ndimage
    from pyimsegm_tpu.ops.morphology import binary_opening
    seg = np.asarray(seg)
    seg_bg = ~ndimage.binary_fill_holes(seg > 0)
    if sel_bg > 0:
        seg_bg = np.asarray(binary_opening(jnp.asarray(seg_bg), int(sel_bg)))
    seg_fg = seg == 1
    if sel_fg > 0:
        seg_fg = np.asarray(binary_opening(jnp.asarray(seg_fg), int(sel_fg)))
    return seg_bg, seg_fg


def prepare_boundary_points_ray_join(seg, centers, close_points=5,
                                     min_diam=MIN_ELLIPSE_DAIM,
                                     sel_bg=STRUC_ELEM_BG,
                                     sel_fg=STRUC_ELEM_FG):
    """Union of background-entry and foreground-exit ray hits
    (`ellipse_fitting.py:352-397`)."""
    seg_bg, seg_fg = split_segm_background_foreground(seg, sel_bg, sel_fg)
    points_centers = []
    for center in centers:
        ray_bg = np.array(compute_ray_features_segm_2d(seg_bg, center))
        ray_bg[ray_bg < min_diam] = min_diam
        points_bg = reduce_close_points(
            reconstruct_ray_features_2d(center, ray_bg), close_points)
        ray_fc = np.array(compute_ray_features_segm_2d(seg_fg, center,
                                                       edge='down'))
        ray_fc[ray_fc < min_diam] = min_diam
        points_fc = reduce_close_points(
            reconstruct_ray_features_2d(center, ray_fc), close_points)
        points_centers.append(np.vstack((points_bg, points_fc)))
    return points_centers


def _rays_bg_fg_min(seg_bg, seg_fc, center, min_diam):
    ray_bg = compute_ray_features_segm_2d(seg_bg, center)
    ray_fc = compute_ray_features_segm_2d(seg_fc, center, edge='down')
    rays = np.array([ray_bg, ray_fc], dtype=float)
    rays[rays < 0] = np.inf
    rays[rays < min_diam] = min_diam
    return rays


def prepare_boundary_points_ray_edge(seg, centers, close_points=5,
                                     min_diam=MIN_ELLIPSE_DAIM,
                                     sel_bg=STRUC_ELEM_BG,
                                     sel_fg=STRUC_ELEM_FG):
    """Min of background/foreground ray hits per angle
    (`ellipse_fitting.py:446-494`)."""
    seg_bg, seg_fc = split_segm_background_foreground(seg, sel_bg, sel_fg)
    points_centers = []
    for center in centers:
        rays = _rays_bg_fg_min(seg_bg, seg_fc, center, min_diam)
        ray_close = np.min(rays, axis=0)
        points = reduce_close_points(
            reconstruct_ray_features_2d(center, ray_close), close_points)
        points_centers.append(points)
    return points_centers


def prepare_boundary_points_ray_mean(seg, centers, close_points=5,
                                     min_diam=MIN_ELLIPSE_DAIM,
                                     sel_bg=STRUC_ELEM_BG,
                                     sel_fg=STRUC_ELEM_FG):
    """Mean of background/foreground ray hits, min fallback
    (`ellipse_fitting.py:497-549`)."""
    seg_bg, seg_fc = split_segm_background_foreground(seg, sel_bg, sel_fg)
    points_centers = []
    for center in centers:
        rays = _rays_bg_fg_min(seg_bg, seg_fc, center, min_diam)
        ray_min = np.min(rays, axis=0)
        ray_mean = np.mean(rays, axis=0)
        ray_mean[np.isinf(ray_mean)] = ray_min[np.isinf(ray_mean)]
        points = reduce_close_points(
            reconstruct_ray_features_2d(center, ray_mean), close_points)
        points_centers.append(points)
    return points_centers


def prepare_boundary_points_ray_dist(seg, centers, close_points=1,
                                     sel_bg=STRUC_ELEM_BG,
                                     sel_fg=STRUC_ELEM_FG):
    """Background-entry ray hits assigned to their closest centre
    (`ellipse_fitting.py:552-597`)."""
    seg_bg, _ = split_segm_background_foreground(seg, sel_bg, sel_fg)
    points = []
    for center in centers:
        ray = compute_ray_features_segm_2d(seg_bg, center)
        points_bg = reduce_close_points(
            reconstruct_ray_features_2d(center, ray, 0), close_points)
        points += points_bg.tolist()
    points = np.array(points)
    points[(points < 0) & (points > -1e-3)] = 0.

    from pyimsegm_tpu.models.clustering import pairwise_dist2
    d2 = np.asarray(pairwise_dist2(points, np.asarray(centers, float)))
    close_center = np.argmin(d2, axis=1)
    return [points[close_center == i] for i in range(close_center.max() + 1)]


def filter_boundary_points(segm, slic):
    """Superpixel centres whose neighbourhood mixes fg/bg labels
    (`ellipse_fitting.py:600-622`)."""
    from pyimsegm_tpu.ops import graph as graph_ops
    segm = np.asarray(segm)
    slic = np.asarray(slic)
    k = int(slic.max()) + 1
    centers = np.asarray(graph_ops.superpixel_centers(
        jnp.asarray(slic), k)).astype(int)
    labels = segm[centers[:, 0], centers[:, 1]]
    edges, valid = graph_ops.adjacency_edges_2d(jnp.asarray(slic), k)
    edges = np.asarray(edges)[np.asarray(valid)]
    nb_labels = labels.max() + 1
    neigh = np.zeros((k, nb_labels))
    np.add.at(neigh, (edges[:, 0], labels[edges[:, 1]]), 1)
    np.add.at(neigh, (edges[:, 1], labels[edges[:, 0]]), 1)
    neigh = neigh / np.maximum(neigh.sum(axis=1, keepdims=True), 1e-9)
    filter_bg = (labels == 0) & (neigh[:, 0] < 1)
    filter_fc = (labels == 1) & (neigh[:, 0] > 0)
    return centers[filter_bg | filter_fc]


def prepare_boundary_points_close(seg, centers, sp_size=25,
                                  relative_compact=0.3):
    """Mixed-neighbourhood superpixel centres split by closest object centre
    (`ellipse_fitting.py:625-653`)."""
    from pyimsegm_tpu.ops.slic import segment_slic_img2d
    seg = np.asarray(seg)
    slic = np.asarray(segment_slic_img2d(
        seg / float(max(seg.max(), 1)), sp_size=sp_size,
        relative_compact=relative_compact))
    points_all = filter_boundary_points(seg, slic)
    from pyimsegm_tpu.models.clustering import pairwise_dist2
    d2 = np.asarray(pairwise_dist2(points_all.astype(float),
                                   np.asarray(centers, float)))
    close_center = np.argmin(d2, axis=1)
    return [points_all[close_center == i]
            for i in range(int(close_center.max() + 1))]
