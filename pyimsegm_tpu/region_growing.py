"""Region growing with learned shape priors (RG2Sp) + object GraphCut.

TPU-native re-design of the reference's third method family
(`/root/reference/imsegm/region_growing.py`):

* **shape models** — ray-length distributions fitted with the in-package
  clustering/GMM (`pyimsegm_tpu.models`) and turned into per-angle inverse-CDF
  survival tables (`region_growing.py:334-588`);
* **prior evaluation** — one vectorized bilinear gather over all superpixel
  centres per object (`pyimsegm_tpu.ops.shape_prior`), replacing the
  per-point Python loop that is the reference's hot spot
  (`region_growing.py:845-847`);
* **greedy solver** — ALL candidate flips are scored at once from the local
  energy decomposition (two segment-sums over the static edge list) instead
  of re-evaluating the global criterion per candidate
  (`region_growing.py:1362-1371`);
* **GraphCut solver** — the dynamic boundary-band subgraph
  (`region_growing.py:1391-1464`) becomes a shape-static clamped solve on the
  full padded superpixel graph: non-candidate nodes carry hard unaries for
  their current label, candidates are restricted to labels present in their
  neighbourhood, and the on-device mean-field/ICM minimizer
  (`pyimsegm_tpu.ops.graphcut.solve_mrf`) replaces C++ alpha-expansion.

Energy terms, clipping constants and the centre/shift/volume hysteresis
(`region_growing.py:27-39`) replicate the reference numerics exactly.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.labeling import histogram_regions_labels_norm
from pyimsegm_tpu.models import clustering
from pyimsegm_tpu.models.gmm import GMMParams, gmm_predict_proba, kmeans_fit
from pyimsegm_tpu.ops import graph as graph_ops
from pyimsegm_tpu.ops import shape_prior as sp_ops
from pyimsegm_tpu.ops.graphcut import MAX_PAIRWISE_COST, solve_mrf
from pyimsegm_tpu.ops.ray import (
    compute_ray_features_segm_2d,
    interpolate_ray_dist,
    shift_ray_features,
)
from pyimsegm_tpu.ops.shape_prior import (  # noqa: F401  (public re-export)
    compute_cumulative_distrib,
    compute_shape_prior_table_cdf,
)

#: replacement for infinite Graph-Cut terms (`region_growing.py:28`)
GC_REPLACE_INF = 1e5
#: minimal shape-prior probability (`region_growing.py:30`)
MIN_SHAPE_PROB = 0.01
#: maximal unary probability (`region_growing.py:32`)
MAX_UNARY_PROB = 1 - 0.01
#: hysteresis thresholds for iterative region growing (`region_growing.py:34-39`)
RG2SP_THRESHOLDS = {
    'centre': 30,
    'shift': 15,
    'volume': 0.1,
    'centre_init': 50,
}


# ------------------------------------------------------------------ graph ---

def _graph_setup(slic):
    """Static superpixel graph: centres, pixel weights, padded edge list."""
    slic_j = jnp.asarray(slic)
    k = int(np.max(slic)) + 1
    edges, valid = graph_ops.adjacency_edges_2d(slic_j, k)
    edges_np = np.asarray(edges)
    valid_np = np.asarray(valid)
    centers = np.asarray(graph_ops.superpixel_centers(slic_j, k))
    weights = np.bincount(np.asarray(slic).ravel(), minlength=k).astype(float)
    return k, edges_np, valid_np, centers, weights


def get_neighboring_segments(edges):
    """Edge list -> per-node neighbour lists (`superpixels.py:245-258`)."""
    edges = np.asarray(edges)
    n = int(edges.max()) + 1 if edges.size else 0
    neigh = [[] for _ in range(n)]
    for a, b in edges:
        if a == b:
            continue
        neigh[a].append(int(b))
        neigh[b].append(int(a))
    return neigh


def _neighbor_class_mask(edges, valid, labels, n_classes):
    """(K, C) bool: class c occurs among conn4 neighbours of node k."""
    k = len(labels)
    mask = np.zeros((k, n_classes), dtype=bool)
    e = edges[valid]
    mask[e[:, 0], labels[e[:, 1]]] = True
    mask[e[:, 1], labels[e[:, 0]]] = True
    return mask


def get_neighboring_candidates(slic_neighbours, labels, object_idx,
                               use_other_obj=True):
    """Boundary-band candidates of one object (`region_growing.py:1088-1111`).

    >>> neighbours = [[1], [0, 2, 3], [1, 3], [1, 2]]
    >>> labels = np.array([0, 0, 1, 1])
    >>> get_neighboring_candidates(neighbours, labels, 1)
    [1]
    """
    labels = np.asarray(labels)
    near = set()
    for idx in np.nonzero(labels == object_idx)[0]:
        near.update(slic_neighbours[idx])
    if use_other_obj:
        return sorted(lb for lb in near if labels[lb] != object_idx)
    return sorted(lb for lb in near if labels[lb] == 0)


def _candidate_masks(edges, valid, labels, nb_objects, allow_obj_swap):
    """Vectorized candidate detection for every object at once.

    :returns: (K, nb_objects+1) bool; [:, o] marks nodes that neighbour
        object ``o`` and may flip to it (column 0 unused).
    """
    k = len(labels)
    has_neigh = _neighbor_class_mask(edges, valid, labels, nb_objects + 1)
    cand = np.zeros((k, nb_objects + 1), dtype=bool)
    for o in range(1, nb_objects + 1):
        if allow_obj_swap:
            cand[:, o] = has_neigh[:, o] & (labels != o)
        else:
            cand[:, o] = has_neigh[:, o] & (labels == 0)
    return cand


# ------------------------------------------------------- energy / penalty ---

def compute_pairwise_penalty(edges, labels, prob_bg_fg=0.05, prob_fg1_fg2=0.01):
    """Per-edge label-transition penalty (`region_growing.py:1065-1085`).

    >>> edges = np.array([[0, 1], [1, 2], [0, 3], [2, 3], [2, 4]])
    >>> labels = np.array([0, 0, 1, 2, 1])
    >>> np.round(compute_pairwise_penalty(edges, labels, 0.05, 0.01), 4)
    array([0.    , 2.9957, 2.9957, 4.6052, 0.    ])
    """
    la = labels[edges[:, 0]]
    lb = labels[edges[:, 1]]
    is_diff = la != lb
    is_bg = is_diff & ((la == 0) | (lb == 0))
    costs = -np.log(prob_fg1_fg2) * is_diff.astype(float)
    costs[is_bg] = -np.log(prob_bg_fg)
    return costs


def _penalty_matrix(nb_classes, prob_label_trans):
    """(C, C) transition penalty: 0 diag, -log p_bg_fg vs bg, -log p_fg1_fg2
    among objects."""
    pen = np.full((nb_classes, nb_classes), -np.log(prob_label_trans[1]))
    pen[0, :] = pen[:, 0] = -np.log(prob_label_trans[0])
    np.fill_diagonal(pen, 0.0)
    return pen


def compute_rg_crit(labels, lut_data_cost, lut_shape_cost, slic_weights, edges,
                    coef_data, coef_shape, coef_pairwise, prob_label_trans):
    """RG2Sp criterion  sum_k w_k (cd*D + cs*S) + cp * sum_e pen
    (`region_growing.py:1114-1133`)."""
    rng = np.arange(len(labels))
    crit = np.sum(slic_weights * (coef_data * lut_data_cost[rng, labels]
                                  + coef_shape * lut_shape_cost[rng, labels]))
    if coef_pairwise > 0:
        pw = compute_pairwise_penalty(edges, labels, prob_label_trans[0],
                                      prob_label_trans[1])
        pw[np.isinf(pw)] = GC_REPLACE_INF
        crit += coef_pairwise * np.sum(pw)
    return crit


def compute_segm_prob_fg(slic, segm, labels_prob):
    """Superpixel foreground probability from a semantic segmentation
    (`region_growing.py:1136-1152`).

    >>> slic = np.array([[0, 0, 0, 0, 1, 1, 1, 1], [2, 2, 2, 2, 3, 3, 3, 3]])
    >>> segm = np.array([0, 1, 1, 0])[slic]
    >>> compute_segm_prob_fg(slic, segm, [0.3, 0.8])
    array([0.3, 0.8, 0.8, 0.3])
    """
    label_hist = np.asarray(histogram_regions_labels_norm(slic, segm))
    slic_labels = np.argmax(label_hist, axis=1)
    return np.asarray(labels_prob)[slic_labels]


def compute_data_costs_points(slic, slic_prob_fg, centres, labels):
    """Data-term LUT; centres hard-assigned (`region_growing.py:993-1011`)."""
    slic_prob_fg = np.asarray(slic_prob_fg, float)
    proba = np.empty((len(labels), len(centres) + 1))
    proba[:, 0] = 1.0 - slic_prob_fg
    for i, centre in enumerate(centres):
        proba[:, i + 1] = slic_prob_fg
        vertex = slic[int(centre[0]), int(centre[1])]
        labels[vertex] = i + 1
    lut = -np.log(proba + 1e-9)
    lut[np.isinf(lut)] = GC_REPLACE_INF
    return lut, labels


def enforce_center_labels(slic, labels, centres):
    """Pin each centre's superpixel to its object
    (`region_growing.py:1467-1479`)."""
    for i, c in enumerate(centres):
        labels[slic[int(c[0]), int(c[1])]] = i + 1
    return labels


# ----------------------------------------------------------- shape models ---

def compute_segm_object_shape(img_object, ray_step=5, interp_order=3,
                              smooth_coef=0, shift_method='phase'):
    """Centre-of-mass ray signature of one binary object
    (`region_growing.py:259-286`)."""
    img_object = np.asarray(img_object).astype(bool)
    total = img_object.sum()
    if total == 0:
        n = int(360 / ray_step)
        return [0.0] * n, 0.0
    ys, xs = np.nonzero(img_object)
    centre = [int(round(ys.mean())), int(round(xs.mean()))]
    ray = compute_ray_features_segm_2d(img_object, centre, ray_step, 0,
                                       edge='down')
    if interp_order is not None and -1 in ray:
        ray = interpolate_ray_dist(ray, interp_order)
    if smooth_coef > 0:
        from scipy.ndimage import gaussian_filter1d
        ray = gaussian_filter1d(ray, smooth_coef)
    ray, shift = shift_ray_features(ray, shift_method)
    return np.asarray(ray).tolist(), shift


def _connected_components(binary):
    """conn4 components of a small binary mask (host union-find)."""
    from scipy import ndimage
    lab, _ = ndimage.label(binary)
    return lab


def compute_object_shapes(list_img_objects, ray_step=5, interp_order=3,
                          smooth_coef=0, shift_method='phase'):
    """Ray signatures of every object over a dataset
    (`region_growing.py:289-331`)."""
    list_rays, list_shifts = [], []
    for img_objects in list_img_objects:
        img_objects = np.asarray(img_objects)
        uq = np.unique(img_objects)
        if len(uq) <= 2:
            img_objects = _connected_components(img_objects > 0)
            uq = np.unique(img_objects)
        for lb in uq[uq > 0]:
            rays, shift = compute_segm_object_shape(
                img_objects == lb, ray_step, interp_order, smooth_coef,
                shift_method)
            list_rays.append(rays)
            list_shifts.append(shift)
    return list_rays, list_shifts


class GMMShapeModel:
    """Mixture over ray vectors with ``predict_proba`` (the reference stores a
    fitted sklearn mixture, `region_growing.py:364-438`)."""

    def __init__(self, params: GMMParams):
        self.params = params
        self.weights_ = np.asarray(params.weights)
        self.means_ = np.asarray(params.means)
        self.covariances_ = np.asarray(params.covs)

    def predict_proba(self, x):
        return np.asarray(gmm_predict_proba(
            self.params, jnp.asarray(np.atleast_2d(x), jnp.float32)))


class KMeansShapeModel:
    """Hard-assignment mixture stand-in for the kmeans-based shape sets
    (`region_growing.py:441-470`)."""

    def __init__(self, centers, labels):
        self.cluster_centers_ = np.asarray(centers)
        self.labels_ = np.asarray(labels)

    def predict_proba(self, x):
        d2 = np.asarray(clustering.pairwise_dist2(
            np.atleast_2d(x), self.cluster_centers_))
        proba = np.zeros_like(d2)
        proba[np.arange(len(d2)), np.argmin(d2, axis=1)] = 1.0
        return proba

def transform_rays_model_cdf_mixture(list_rays, coef_components=1):
    """Bayesian mixture shape model -> survival table
    (`region_growing.py:364-401`); component count from mean-shift modes,
    fitted with the CAVI variational BGM like the reference's
    ``BayesianGaussianMixture`` (see the sets_mean variant for why)."""
    from pyimsegm_tpu.models.bgm import bgm_fit
    rays = np.asarray(list_rays, float)
    _, ms_labels = clustering.mean_shift(rays)
    nb_components = max(1, min(len(np.unique(ms_labels)) * coef_components,
                               len(rays)))
    params = bgm_fit(jax.random.PRNGKey(0), jnp.asarray(rays, jnp.float32),
                     jnp.ones(len(rays), jnp.float32), int(nb_components),
                     n_init=4, max_iter=99)
    model = GMMShapeModel(params)
    stds = np.sqrt(np.abs(np.diagonal(model.covariances_, axis1=1, axis2=2)))
    max_dist = np.max(model.means_ + stds)
    cdist = compute_cumulative_distrib(model.means_, stds, model.weights_,
                                       max_dist)
    return model, cdist.tolist()


def _smooth1d(x, sigma=1.0):
    from scipy.ndimage import gaussian_filter1d
    return gaussian_filter1d(np.asarray(x, float), sigma)


def transform_rays_model_sets_mean_cdf_mixture(list_rays, nb_components=5,
                                               slic_size=15):
    """Diagonal Bayesian mixture -> per-component (mean, survival table)
    sets (`region_growing.py:404-438`).

    The reference fits ``BayesianGaussianMixture(covariance_type='diag')``;
    this uses the CAVI variational BGM (``models/bgm``, diag mode) — the
    round-2 side-by-side showed the mixture fit is what separates RG2Sp
    quality (ARS 0.73 with a plain kmeans/GMM fit vs 0.85 with the
    reference's Bayesian fit on identical solver inputs)."""
    from pyimsegm_tpu.models.bgm import bgm_fit
    rays = np.asarray(list_rays, float)
    nb_components = max(1, min(int(nb_components), len(rays)))
    params = bgm_fit(jax.random.PRNGKey(0), jnp.asarray(rays, jnp.float32),
                     jnp.ones(len(rays), jnp.float32), nb_components,
                     n_init=4, max_iter=99, diag=True)
    model = GMMShapeModel(params)
    list_mean_cdf = []
    for mean, covar in zip(model.means_, model.covariances_):
        var = np.diagonal(covar) if covar.ndim == 2 else covar
        std = np.sqrt(var + 1) * 2 + slic_size
        mean = _smooth1d(mean)
        std = _smooth1d(std)
        max_dist = np.max(mean + 2 * std)
        cdist = compute_cumulative_distrib(mean[None], std[None],
                                           np.ones(1), max_dist)
        list_mean_cdf.append((mean.tolist(), cdist))
    return model, list_mean_cdf


def transform_rays_model_sets_mean_cdf_kmeans(list_rays, nb_components=5):
    """K-means cluster shapes -> per-cluster (mean, survival table) sets
    (`region_growing.py:441-470`)."""
    rays = np.asarray(list_rays, float)
    nb_components = max(1, min(nb_components, len(rays)))
    centers, labels = kmeans_fit(
        jax.random.PRNGKey(0), jnp.asarray(rays, jnp.float32),
        jnp.ones(len(rays), jnp.float32), nb_components)
    model = KMeansShapeModel(np.asarray(centers), np.asarray(labels))
    list_mean_cdf = []
    for lb, mean in enumerate(model.cluster_centers_):
        members = rays[model.labels_ == lb]
        std = members.std(axis=0) if len(members) else np.zeros(rays.shape[1])
        mean = _smooth1d(mean)
        std = (_smooth1d(std) + 1) * 5.0
        max_dist = np.max(mean + 2 * std)
        cdist = compute_cumulative_distrib(mean[None], std[None],
                                           np.ones(1), max_dist)
        list_mean_cdf.append((mean.tolist(), cdist))
    return model, list_mean_cdf


def transform_rays_model_cdf_spectral(list_rays, nb_components=5):
    """Spectral-clustering mixture -> survival table
    (`region_growing.py:473-510`)."""
    rays = np.asarray(list_rays, float)
    nb_components = max(1, min(nb_components, len(rays)))
    labels = clustering.spectral_clustering(rays, nb_components)
    uq = np.unique(labels)
    means = np.stack([_smooth1d(rays[labels == lb].mean(axis=0)) for lb in uq])
    stds = np.stack([rays[labels == lb].std(axis=0) for lb in uq]) + 1
    weights = np.bincount(labels)[uq] / float(len(labels))
    max_dist = np.max(means + stds)
    cdist = compute_cumulative_distrib(means, stds, weights, max_dist)
    model = KMeansShapeModel(means, labels)
    return model, cdist.tolist()


def transform_rays_model_cdf_kmeans(list_rays, nb_components=None):
    """K-means mixture -> survival table (`region_growing.py:513-554`);
    component count from mean-shift modes when not given."""
    rays = np.asarray(list_rays, float)
    if not nb_components:
        _, ms_labels = clustering.mean_shift(rays)
        nb_components = len(np.unique(ms_labels))
    nb_components = max(1, min(nb_components, len(rays)))
    centers, labels = kmeans_fit(
        jax.random.PRNGKey(0), jnp.asarray(rays, jnp.float32),
        jnp.ones(len(rays), jnp.float32), nb_components)
    centers, labels = np.asarray(centers), np.asarray(labels)
    stds = np.stack([
        rays[labels == lb].std(axis=0) if np.any(labels == lb)
        else np.zeros(rays.shape[1]) for lb in range(nb_components)]) + 1
    weights = np.bincount(labels, minlength=nb_components) / float(len(labels))
    max_dist = np.max(centers + stds)
    cdist = compute_cumulative_distrib(centers, stds, weights, max_dist)
    return KMeansShapeModel(centers, labels), cdist.tolist()


def transform_rays_model_cdf_histograms(list_rays, nb_bins=10):
    """Per-angle cumulative histograms (`region_growing.py:557-588`)."""
    rays = np.asarray(list_rays)
    max_dist = int(np.max(rays))
    list_chist = []
    for i in range(rays.shape[1]):
        cum = np.zeros(max_dist + 1)
        hist, bin_edges = np.histogram(rays[:, i], nb_bins)
        hist = hist.astype(float) / np.sum(hist)
        bins = ((bin_edges[1:] + bin_edges[:-1]) / 2).astype(int)
        cum[:bins[0]] = 1
        for j, edge in enumerate(bins):
            cum[edge:] = cum[edge - 1] - hist[j]
        list_chist.append(cum.tolist())
    return list_chist


# ------------------------------------------------------ shape-cost update ---

def compute_centre_moment_points(points):
    """Centre + principal-axis orientation of a point cloud
    (`region_growing.py:704-747`)."""
    points = np.asarray(points, float)
    centre = points.mean(axis=0)
    diff = points - centre
    if len(points) > 1:
        cov = np.cov(diff.T)
        evals, evecs = np.linalg.eig(cov)
        evec1 = evecs[:, np.argmax(evals)]
        theta = np.arctan2(evec1[0], evec1[1])
    else:
        theta = 0
    theta = (360 + round(np.rad2deg(theta))) % 360
    return centre, float(theta)


def _eval_prior_costs(points, cdf, centre, shift, selected_mask=None):
    """-log(prior + eps) for all points at once (batched device lookup)."""
    proba = np.asarray(sp_ops.shape_prior_points(
        jnp.asarray(points, jnp.float32), np.asarray(cdf, float),
        jnp.asarray(centre, jnp.float32), float(shift)))
    if selected_mask is not None:
        proba = np.where(selected_mask, proba, 0.0)
    cost = -np.log(proba + MIN_SHAPE_PROB)
    cost[np.isinf(cost)] = GC_REPLACE_INF
    return cost


@jax.jit
def _prior_proba_all_objects(points, tables, centres, shifts):
    """(O, N) shape priors for every object in ONE device program — the
    per-iteration RG2Sp shape update makes a single dispatch + fetch instead
    of one per object (each round-trip costs ~25 ms on a remote-attached
    device, which dominated BASELINE config 5's per-iteration wall)."""
    return jax.vmap(
        lambda t, c, s: sp_ops.shape_prior_points(points, t, c, s)
    )(tables, centres, shifts)


def _eval_prior_costs_all(points, tables, centres, shifts,
                          selected_mask=None):
    """-log(prior + eps) for all objects at once; ``tables`` is (O, A, D)."""
    proba = np.asarray(_prior_proba_all_objects(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(np.asarray(tables), jnp.float32),
        jnp.asarray(np.asarray(centres), jnp.float32),
        jnp.asarray(np.asarray(shifts), jnp.float32)))
    if selected_mask is not None:
        proba = np.where(selected_mask[None, :], proba, 0.0)
    cost = -np.log(proba + MIN_SHAPE_PROB)
    cost[np.isinf(cost)] = GC_REPLACE_INF
    return cost


def _hysteresis_update(i, points, labels, init_centres, centres, shifts,
                       volumes, swap_shift, thresholds, track_volume):
    """Shared centre/shift/volume hysteresis for one object
    (`region_growing.py:815-843,938-971`).  Returns (changed, shift)."""
    members = points[labels == i + 1]
    if len(members) == 0:
        return False, shifts[i]
    centre_new, shift = compute_centre_moment_points(members)
    centre_new = np.round(centre_new).astype(int)
    if swap_shift:
        shift = (shift + 90) % 360
        shifts[i] = shift

    volume_diff = 0.0
    if track_volume:
        volume = np.sum(labels == (i + 1))
        volume_diff = 0 if volumes[i] == 0 else \
            np.abs(volume - volumes[i]) / float(volumes[i])

    cdist_init_2 = np.sum((centre_new - np.asarray(init_centres[i])) ** 2)
    if cdist_init_2 > thresholds['centre_init'] ** 2:
        diff = centre_new - np.asarray(init_centres[i])
        thr = thresholds['centre_init'] / np.sqrt(cdist_init_2)
        centre_new = init_centres[i] + thr * diff

    cdist_act_2 = np.sum((np.asarray(centre_new) - np.asarray(centres[i])) ** 2)
    in_centre = cdist_act_2 <= thresholds['centre'] ** 2
    in_shift = np.abs(shift - shifts[i]) <= thresholds['shift']
    in_volume = (not track_volume) or volume_diff <= thresholds['volume']
    if in_centre and in_shift and in_volume and not swap_shift:
        return False, shift
    if cdist_act_2 > thresholds['centre'] ** 2:
        centres[i] = np.asarray(centre_new).tolist()
    if np.abs(shift - shifts[i]) > thresholds['shift']:
        shifts[i] = shift
    if track_volume and volume_diff > thresholds['volume']:
        volumes[i] = np.sum(labels == (i + 1))
    return True, shift


def compute_update_shape_costs_points_table_cdf(
        lut_shape_cost, points, labels, init_centres, centres, shifts,
        volumes, shape_chist, selected_idx=None, swap_shift=False,
        dict_thresholds=None):
    """Shape-cost update for the single-table CDF model
    (`region_growing.py:750-852`); prior lookups batched on device."""
    if len(points) != len(labels):
        raise ValueError('number of points (%i) and labels (%i) should match'
                         % (len(points), len(labels)))
    thresholds = RG2SP_THRESHOLDS if dict_thresholds is None else dict_thresholds
    sel_mask = None
    if selected_idx is not None:
        sel_mask = np.zeros(len(points), dtype=bool)
        sel_mask[np.asarray(selected_idx, int)] = True
    _, cdf = shape_chist
    points = np.asarray(points)
    labels = np.asarray(labels)
    centres = [list(c) for c in centres]
    shifts = np.asarray(shifts, float)
    changed_mask = []
    for i in range(len(centres)):
        changed, _ = _hysteresis_update(
            i, points, labels, init_centres, centres, shifts, volumes,
            swap_shift, thresholds, track_volume=False)
        changed_mask.append(changed)
    if any(changed_mask):
        # one dispatch for ALL objects (shared table), update changed columns
        cdf_np = np.asarray(cdf, float)
        costs = _eval_prior_costs_all(
            points, np.broadcast_to(cdf_np, (len(centres),) + cdf_np.shape),
            centres, shifts, sel_mask)
        for i, ch in enumerate(changed_mask):
            if ch:
                lut_shape_cost[:, i + 1] = costs[i]
    lut_shape_cost[np.isinf(lut_shape_cost)] = GC_REPLACE_INF
    return lut_shape_cost, np.array(centres), np.array(shifts, float), volumes


def compute_update_shape_costs_points_close_mean_cdf(
        lut_shape_cost, slic, points, labels, init_centres, centres, shifts,
        volumes, shape_model_cdfs, selected_idx=None, swap_shift=False,
        dict_thresholds=None):
    """Shape-cost update blending component tables by the mixture posterior of
    the object's current ray signature (`region_growing.py:855-990`)."""
    if len(points) != len(labels):
        raise ValueError('number of points (%i) and labels (%i) should match'
                         % (len(points), len(labels)))
    thresholds = RG2SP_THRESHOLDS if dict_thresholds is None else dict_thresholds
    sel_mask = None
    if selected_idx is not None:
        sel_mask = np.zeros(len(points), dtype=bool)
        sel_mask[np.asarray(selected_idx, int)] = True
    points = np.asarray(points)
    labels = np.asarray(labels)
    centres = [list(c) for c in centres]
    shifts = np.asarray(shifts, float)
    segm_obj = labels[np.asarray(slic)]
    model, list_mean_cdf = shape_model_cdfs
    list_cdfs = [np.asarray(cdf) for _, cdf in list_mean_cdf]
    angle_step = 360 / len(list_cdfs[0])
    max_shape = tuple(np.max([c.shape for c in list_cdfs], axis=0))
    changed_mask, tables = [], []
    for i in range(len(centres)):
        rays, _ = compute_segm_object_shape(segm_obj == i + 1, angle_step,
                                            smooth_coef=0)
        changed, _ = _hysteresis_update(
            i, points, labels, init_centres, centres, shifts, volumes,
            swap_shift, thresholds, track_volume=True)
        changed_mask.append(changed)
        if not changed:
            tables.append(np.zeros(max_shape))
            continue
        weights = model.predict_proba([rays]).ravel()
        cdist = np.zeros(max_shape)
        for j, cdf in enumerate(list_cdfs):
            cdist[:, :cdf.shape[1]] += weights[j] * cdf
        tables.append(cdist)
    if any(changed_mask):
        costs = _eval_prior_costs_all(points, np.stack(tables), centres,
                                      shifts, sel_mask)
        for i, ch in enumerate(changed_mask):
            if ch:
                lut_shape_cost[:, i + 1] = costs[i]
    lut_shape_cost[np.isinf(lut_shape_cost)] = GC_REPLACE_INF
    return lut_shape_cost, np.array(centres), np.array(shifts, float), volumes


def update_shape_costs_points(lut_shape_cost, slic, points, labels,
                              init_centres, centres, shifts, volumes,
                              shape_model, shape_type, selected_idx=None,
                              swap_shift=False, dict_thresholds=None):
    """Dispatch by shape-model type (`region_growing.py:1014-1062`)."""
    thresholds = RG2SP_THRESHOLDS if dict_thresholds is None else dict_thresholds
    if shape_type == 'cdf':
        return compute_update_shape_costs_points_table_cdf(
            lut_shape_cost, points, labels, init_centres, centres, shifts,
            volumes, shape_model, selected_idx, swap_shift, thresholds)
    if shape_type == 'set_cdfs':
        return compute_update_shape_costs_points_close_mean_cdf(
            lut_shape_cost, slic, points, labels, init_centres, centres,
            shifts, volumes, shape_model, selected_idx, swap_shift, thresholds)
    raise NameError('Not supported type of shape model "%s"' % shape_type)


# ----------------------------------------------------------------- greedy ---

def _flip_energy_changes(labels, lut_cost, node_weights, edges, evalid, pen,
                         coef_pairwise):
    """Energy change of flipping every node to every class, in one pass.

    Local decomposition of `region_growing.py:1362-1371`: two segment-sums
    over the static edge list give each node's incident transition penalty
    for all classes simultaneously.

    :param lut_cost: (K, C) combined per-node class cost
        (coef_data*data + coef_shape*shape)
    :returns: (K, C) energy *decrease* of flipping node k to class c
    """
    labels_j = jnp.asarray(labels, jnp.int32)
    lut = jnp.asarray(lut_cost, jnp.float32)
    k, _ = lut.shape
    w = jnp.asarray(evalid, jnp.float32)
    pen_j = jnp.asarray(pen, jnp.float32)
    e0, e1 = edges[:, 0], edges[:, 1]
    pa = pen_j[:, labels_j[e1]].T * w[:, None]       # (E, C): pen(c, l_b)
    pb = pen_j[:, labels_j[e0]].T * w[:, None]
    p_inc = jax.ops.segment_sum(pa, e0, num_segments=k)
    p_inc += jax.ops.segment_sum(pb, e1, num_segments=k)
    cur_cost = jnp.take_along_axis(lut, labels_j[:, None], 1)
    p_cur = jnp.take_along_axis(p_inc, labels_j[:, None], 1)
    delta = (jnp.asarray(node_weights, jnp.float32)[:, None]
             * (lut - cur_cost) + coef_pairwise * (p_inc - p_cur))
    return -delta


def region_growing_shape_slic_greedy(
        slic, slic_prob_fg, centres, shape_model, shape_type='cdf',
        coef_data=1., coef_shape=1, coef_pairwise=1,
        prob_label_trans=(.1, .01), allow_obj_swap=True, greedy_tol=1e-3,
        dict_thresholds=None, nb_iter=999, debug_history=None):
    """Greedy RG2Sp (`region_growing.py:1155-1388`): all candidate flips
    scored in parallel per round; swap-shift escape after futile rounds."""
    slic = np.asarray(slic)
    if len(slic_prob_fg) < np.max(slic):
        raise ValueError('dims of probs %s and slic %s not match'
                         % (len(slic_prob_fg), np.max(slic)))
    thresholds = RG2SP_THRESHOLDS if dict_thresholds is None else dict_thresholds
    k, edges, evalid, centers_np, slic_weights = _graph_setup(slic)
    slic_points = np.round(centers_np).astype(int)
    init_centres = np.round(np.asarray(centres)).astype(int)
    nb_obj = len(init_centres)
    edges_valid_np = edges[evalid]
    edges_j = jnp.asarray(edges)
    evalid_j = jnp.asarray(evalid)

    labels = np.zeros(k, dtype=int)
    lut_data_cost, labels = compute_data_costs_points(
        slic, slic_prob_fg, init_centres, labels)
    lut_shape_cost = np.empty((k, nb_obj + 1))
    lut_shape_cost[:, 0] = -np.log(1 - np.asarray(slic_prob_fg, float))
    centres_act = np.full(init_centres.shape, np.inf)
    shifts = np.zeros(nb_obj)
    volumes = [1] * nb_obj
    list_swap_shift = [False]
    lut_shape_cost, centres_act, shifts, volumes = update_shape_costs_points(
        lut_shape_cost, slic, slic_points, labels, init_centres, centres_act,
        shifts, volumes, shape_model, shape_type, None, False, thresholds)

    if debug_history is not None:
        debug_history.update({'criteria': [], 'labels': [], 'centres': [],
                              'shifts': [], 'lut_data_cost': lut_data_cost.copy(),
                              'lut_shape_cost': []})

    pen = _penalty_matrix(nb_obj + 1, prob_label_trans)
    for _ in range(nb_iter):
        labels = enforce_center_labels(slic, labels, centres_act)
        if debug_history is not None:
            crit = compute_rg_crit(labels, lut_data_cost, lut_shape_cost,
                                   slic_weights, edges_valid_np, coef_data,
                                   coef_shape, coef_pairwise, prob_label_trans)
            debug_history['labels'].append(labels.copy())
            debug_history['criteria'].append(crit)
            debug_history['centres'].append(centres_act.copy())
            debug_history['shifts'].append(shifts.tolist())
            debug_history['lut_shape_cost'].append(lut_shape_cost.copy())

        cand = _candidate_masks(edges, evalid, labels, nb_obj, allow_obj_swap)

        lut_shape_cost, centres_act, shifts, volumes = update_shape_costs_points(
            lut_shape_cost, slic, slic_points, labels, init_centres,
            centres_act, shifts, volumes, shape_model, shape_type, None,
            list_swap_shift[-1], thresholds)

        lut_cost = coef_data * lut_data_cost + coef_shape * lut_shape_cost
        scores = np.asarray(_flip_energy_changes(
            labels, lut_cost, slic_weights, edges_j, evalid_j, pen,
            coef_pairwise))
        scores = np.where(cand, scores, -np.inf)

        best = np.max(scores)
        if not np.isfinite(best) or best < 0:
            if any(list_swap_shift[-7:]):
                break
            list_swap_shift.append(True)
            continue
        list_swap_shift.append(False)

        # apply every flip within the greedy tolerance of the best one
        node_best_cls = np.argmax(scores, axis=1)
        node_best = scores[np.arange(k), node_best_cls]
        flip = (node_best > 0) & ((best - node_best) / best < greedy_tol)
        labels[flip] = node_best_cls[flip]

    return labels


# --------------------------------------------------------------- graphcut ---

def prepare_graphcut_variables(candidates, slic_points, slic_neighbours,
                               slic_weights, labels, nb_centres,
                               lut_data_cost, lut_shape_cost, coef_data,
                               coef_shape, coef_pairwise, prob_label_trans):
    """Boundary-band subgraph with hard-clamped closure, reference-compatible
    output (`region_growing.py:1391-1464`); kept for API parity — the solver
    below uses the shape-static full-graph clamped formulation instead."""
    if np.max(candidates) >= len(slic_points):
        raise ValueError('max candidate idx: %d for %d centres'
                         % (np.max(candidates), len(slic_points)))
    unary_rows, vertexes, gc_edges = [], list(candidates), []
    for i, idx in enumerate(candidates):
        near_idx = slic_neighbours[idx]
        near_labels = labels[near_idx]
        cost = coef_data * lut_data_cost[idx] + coef_shape * lut_shape_cost[idx]
        row = slic_weights[idx] * cost
        for lb in range(len(row)):
            if lb not in near_labels:
                row[lb] = GC_REPLACE_INF
        unary_rows.append(row)
    unary = np.array(unary_rows)
    for i, idx in enumerate(candidates):
        for n_idx in slic_neighbours[idx]:
            if n_idx not in vertexes:
                vertexes.append(n_idx)
                u = np.full(unary.shape[-1], GC_REPLACE_INF)
                u[labels[n_idx]] = 0
                unary = np.vstack((unary, u))
            gc_edges.append((i, vertexes.index(n_idx)))

    min_unary = -np.log(MAX_UNARY_PROB)
    unary[unary < min_unary] = min_unary
    pts = np.asarray(slic_points)[vertexes]
    e = np.asarray(gc_edges)
    d = pts[e[:, 0]] - pts[e[:, 1]]
    dist = np.sqrt(np.sum(d * d, axis=1))
    spatial = dist / np.mean(dist)
    edge_weights = np.ones(len(gc_edges)) / spatial
    pairwise = _penalty_matrix(unary.shape[-1], prob_label_trans) * coef_pairwise
    pairwise[pairwise > MAX_PAIRWISE_COST] = MAX_PAIRWISE_COST
    return vertexes, e, edge_weights, unary, pairwise


def _infer_grid_cfg(slic):
    """Recover the SLIC grid geometry from a label map, if it is one.

    Labels from this framework's default 2D SLIC satisfy the 3x3-tile
    invariant for the ``slic_config`` that produced them; detecting it lets
    every RG2Sp caller ride the dense grid MRF solve without plumbing the
    config through the reference-shaped API.  Returns ``None`` for
    non-grid maps (e.g. the dynamic-K compat mode), which keep the
    edge-list solver.
    """
    import math

    from pyimsegm_tpu.ops.slic import slic_config
    h, w = slic.shape
    k = int(np.max(slic)) + 1
    if k <= 1:
        return None
    s0 = int(round(math.sqrt(h * w / k)))
    for s in range(max(2, s0 - 2), s0 + 3):
        cfg = slic_config(h, w, s)
        if cfg.n_segments != k:
            continue
        gw, step = cfg.grid_w, cfg.step
        ty = np.arange(h)[:, None] // step
        tx = np.arange(w)[None, :] // step
        ly = slic // gw
        lx = slic - ly * gw
        if (np.abs(ly - ty) <= 1).all() and (np.abs(lx - tx) <= 1).all():
            return cfg
    return None


def region_growing_shape_slic_graphcut(
        slic, slic_prob_fg, centres, shape_model, shape_type='cdf',
        coef_data=1., coef_shape=1, coef_pairwise=2,
        prob_label_trans=(0.1, 0.03), optim_global=True, allow_obj_swap=True,
        dict_thresholds=None, nb_iter=999, debug_history=None,
        grid_cfg=None):
    """GraphCut RG2Sp (`region_growing.py:1482-1728`), solved per round as a
    clamped full-graph MRF on device: candidates keep their weighted
    data+shape costs restricted to neighbourhood labels, every other node is
    hard-assigned its current label, and ``solve_mrf`` minimises the result.

    ``grid_cfg`` (a :class:`~pyimsegm_tpu.ops.slic.SlicConfig` whose grid
    produced ``slic``) routes the per-iteration solves through the dense
    25-neighbour grid formulation (:func:`ops.grid.solve_mrf_grid` over
    :func:`ops.grid.wgrid_from_edges`) — no per-iteration edge scatters."""
    slic = np.asarray(slic)
    if len(slic_prob_fg) < np.max(slic):
        raise ValueError('dims of probs %s and slic %s not match'
                         % (len(slic_prob_fg), np.max(slic)))
    thresholds = RG2SP_THRESHOLDS if dict_thresholds is None else dict_thresholds
    k, edges, evalid, centers_np, slic_weights = _graph_setup(slic)
    slic_points = np.round(centers_np).astype(int)
    init_centres = np.round(np.asarray(centres)).astype(int)
    nb_obj = len(init_centres)
    edges_valid_np = edges[evalid]

    labels = np.zeros(k, dtype=int)
    labels_history = [labels.copy()]
    lut_data_cost, labels = compute_data_costs_points(
        slic, slic_prob_fg, init_centres, labels)
    lut_shape_cost = np.empty((k, nb_obj + 1))
    lut_shape_cost[:, 0] = -np.log(1 - np.asarray(slic_prob_fg, float) + 1e-9)
    centres_act = np.full(init_centres.shape, np.inf)
    shifts = np.zeros(nb_obj)
    volumes = [1] * nb_obj
    list_swap_shift = [False]
    lut_shape_cost, centres_act, shifts, volumes = update_shape_costs_points(
        lut_shape_cost, slic, slic_points, labels, init_centres, centres_act,
        shifts, volumes, shape_model, shape_type, None, False, thresholds)

    if debug_history is not None:
        debug_history.update({'criteria': [], 'labels': [], 'centres': [],
                              'shifts': [], 'lut_data_cost': lut_data_cost.copy(),
                              'lut_shape_cost': []})

    # static geometry for the clamped solves
    edges_j = jnp.asarray(edges)
    evalid_j = jnp.asarray(evalid)
    spatial = np.asarray(graph_ops.compute_spatial_dist(
        jnp.asarray(centers_np, jnp.float32), edges_j, evalid_j,
        relative=True))
    edge_w = np.where(evalid, 1.0 / np.maximum(spatial, 1e-12), 0.0)
    pairwise = _penalty_matrix(nb_obj + 1, prob_label_trans) * coef_pairwise
    pairwise = np.minimum(pairwise, MAX_PAIRWISE_COST)
    min_unary = -np.log(MAX_UNARY_PROB)

    if grid_cfg is None:
        grid_cfg = _infer_grid_cfg(slic)
    wgrid = None
    if grid_cfg is not None and grid_cfg.n_segments == k:
        from pyimsegm_tpu.ops.grid import solve_mrf_grid, wgrid_from_edges
        wgrid = wgrid_from_edges(edges_j, evalid_j,
                                 jnp.asarray(edge_w, jnp.float32), grid_cfg)

    def _solve_clamped(labels, cand_any, cand_cls):
        unary = np.full((k, nb_obj + 1), GC_REPLACE_INF)
        cost = (coef_data * lut_data_cost + coef_shape * lut_shape_cost) \
            * slic_weights[:, None]
        # candidates: weighted cost on labels present in their neighbourhood
        # (own label stays admissible so every node has a feasible state)
        allowed = cand_cls.copy()
        allowed[np.arange(k), labels] = True
        unary[cand_any] = np.where(allowed[cand_any], cost[cand_any],
                                   GC_REPLACE_INF)
        # everyone else: hard-clamped to the current label
        fixed = ~cand_any
        rows = np.nonzero(fixed)[0]
        unary[rows] = GC_REPLACE_INF
        unary[rows, labels[rows]] = 0.0
        unary[unary < min_unary] = min_unary
        if wgrid is not None:
            from pyimsegm_tpu.ops.grid import solve_mrf_grid
            out = solve_mrf_grid(jnp.asarray(unary, jnp.float32), wgrid,
                                 jnp.asarray(pairwise, jnp.float32),
                                 grid_cfg, n_mf_iters=10, n_icm_iters=6)
            return np.asarray(out).astype(int)
        # light schedule: almost every node is hard-clamped (only the
        # candidate band is free), so the full mean-field/expansion polish
        # is wasted — the outer RG loop re-solves this subgraph every
        # iteration anyway.  Schedule cut measured quality-neutral on the
        # refrun RG2Sp recipe (QUALITY.md round 5) at ~3x less work.
        out = solve_mrf(jnp.asarray(unary, jnp.float32), edges_j,
                        jnp.asarray(edge_w, jnp.float32),
                        jnp.asarray(pairwise, jnp.float32),
                        n_mf_iters=10, n_icm_iters=4, n_expand_rounds=2,
                        n_move_steps=4, n_chains=2)
        return np.asarray(out).astype(int)

    for _ in range(nb_iter):
        labels = enforce_center_labels(slic, labels, centres_act)
        if debug_history is not None:
            crit = compute_rg_crit(labels, lut_data_cost, lut_shape_cost,
                                   slic_weights, edges_valid_np, coef_data,
                                   coef_shape, coef_pairwise, prob_label_trans)
            debug_history['labels'].append(labels.copy())
            debug_history['criteria'].append(crit)
            debug_history['centres'].append(centres_act.copy())
            debug_history['shifts'].append(shifts.tolist())
            debug_history['lut_shape_cost'].append(lut_shape_cost.copy())

        cand = _candidate_masks(edges, evalid, labels, nb_obj, allow_obj_swap)
        neigh_cls = _neighbor_class_mask(edges, evalid, labels, nb_obj + 1)

        lut_shape_cost, centres_act, shifts, volumes = update_shape_costs_points(
            lut_shape_cost, slic, slic_points, labels, init_centres,
            centres_act, shifts, volumes, shape_model, shape_type, None,
            list_swap_shift[-1], thresholds)

        if optim_global:
            labels_gc = _solve_clamped(labels, cand.any(axis=1), neigh_cls)
        else:
            labels_gc = labels.copy()
            for i in range(nb_obj):
                cand_i = np.zeros_like(cand)
                cand_i[:, i + 1] = cand[:, i + 1]
                out = _solve_clamped(labels_gc, cand_i.any(axis=1), neigh_cls)
                labels_gc = out

        if np.array_equal(labels, labels_gc):
            existed = any(np.array_equal(labels_gc, h)
                          for h in labels_history[:-1])
            if any(list_swap_shift[-2:]) or existed:
                break
            list_swap_shift.append(True)
        else:
            list_swap_shift.append(False)
        labels = labels_gc
        labels_history.append(labels.copy())

    return labels


# --------------------------------------------- one-shot object GraphCut -----

def object_segmentation_graphcut_slic(
        slic, segm, centres, labels_fg_prob=(0.1, 0.9), gc_regul=1,
        edge_coef=0.5, edge_type='model', coef_shape=0.,
        shape_mean_std=(50., 10.), add_neighbours=False, debug_visual=None):
    """One-shot multi-object GC on the superpixel graph
    (`region_growing.py:42-156`): per-superpixel fg/bg unaries from the label
    table, optional Gaussian radial shape prior, solved on device."""
    slic = np.asarray(slic)
    segm = np.asarray(segm)
    if np.min(labels_fg_prob) >= 1:
        raise ValueError('non label can be strictly 1')
    if segm.max() > len(labels_fg_prob):
        raise ValueError('table of label prob is shorter then the nb of labels'
                         ' in segmentation')
    if not list(centres):
        raise ValueError('at least one center has to be given')
    label_hist = np.asarray(histogram_regions_labels_norm(slic, segm))
    labels = np.argmax(label_hist, axis=1)
    labels_fg_prob = np.asarray(labels_fg_prob, float)
    labels_bg_prob = 1.0 - labels_fg_prob
    centres = [np.round(c).astype(int) for c in centres]
    k = int(slic.max()) + 1
    edges, evalid, centers_np = _graph_setup(slic)[1:4]
    slic_points = centers_np

    nb_cls = len(centres) + 1
    proba = np.ones((k, nb_cls))
    proba[:, 0] = labels_bg_prob[labels]
    for i in range(len(centres)):
        proba[:, i + 1] = labels_fg_prob[labels]

    shape = np.ones((k, nb_cls))
    if coef_shape > 0:
        shape_mean, shape_std = shape_mean_std
        shape[:, 0] = labels_bg_prob[labels]
        for i, centre in enumerate(centres):
            diff = slic_points - np.asarray(centre, float)[None, :]
            dist = np.sqrt(np.sum(diff ** 2, axis=1))
            cdf = np.asarray(sp_ops.norm_cdf(
                jnp.arange(int(np.max(dist) + 1), dtype=jnp.float32),
                float(shape_mean), float(shape_std)))
            cum = 1.0 - cdf + 1e-9
            shape[:, i + 1] = cum[dist.astype(int)]

    unary = -np.log(proba) - coef_shape * np.log(shape)
    edge_mask_off = np.zeros(len(edges), dtype=bool)
    for i, pos in enumerate(centres):
        vertex = slic[tuple(pos)]
        unary[vertex, i + 1] = 0
        if add_neighbours:
            sel = evalid & ((edges[:, 0] == vertex) | (edges[:, 1] == vertex))
            for v in edges[sel].ravel():
                unary[v, i + 1] = 0
            edge_mask_off |= sel
    min_unary = -np.log(MAX_UNARY_PROB)
    unary[unary < min_unary] = min_unary

    if edge_type == 'model':
        proba_fg = labels_fg_prob[labels]
        dist = np.abs(proba_fg[edges[:, 0]] - proba_fg[edges[:, 1]])
        std = np.std(dist[evalid])
        weights = np.exp(-dist / max(2 * std ** 2, 1e-12))
        spatial = np.asarray(graph_ops.compute_spatial_dist(
            jnp.asarray(centers_np, jnp.float32), jnp.asarray(edges),
            jnp.asarray(evalid), relative=True))
        weights = weights / np.maximum(spatial, 1e-12)
    else:
        weights = np.ones(len(edges))
    weights *= edge_coef
    weights[~evalid | edge_mask_off] = 0.0

    pairwise = (1 - np.eye(nb_cls)) * gc_regul
    if np.isscalar(gc_regul) and gc_regul <= 0:
        graph_labels = np.argmin(unary, axis=1).astype(np.int32)
    else:
        graph_labels = np.asarray(solve_mrf(
            jnp.asarray(unary, jnp.float32), jnp.asarray(edges),
            jnp.asarray(weights, jnp.float32),
            jnp.asarray(pairwise, jnp.float32))).astype(np.int32)

    if debug_visual is not None:
        debug_visual['unary_imgs'] = [unary[:, i][slic]
                                      for i in range(unary.shape[-1])]
    return graph_labels


def _grid_edges(height, width):
    idx = np.arange(height * width).reshape(height, width)
    ev = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)
    eh = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1)
    return np.concatenate([ev, eh], axis=0)


def object_segmentation_graphcut_pixels(
        segm, centres, labels_fg_prob=(0.1, 0.9), gc_regul=1, seed_size=0,
        coef_shape=0., shape_mean_std=(50., 10.), debug_visual=None):
    """One-shot multi-object GC on the pixel grid
    (`region_growing.py:159-256`) with a static conn4 edge list on device."""
    segm = np.asarray(segm)
    if np.min(labels_fg_prob) >= 1:
        raise ValueError('non label can be strictly 1')
    if segm.max() > len(labels_fg_prob):
        raise ValueError('table of label proba is shorter then the nb of'
                         ' labels in segmentation')
    if not list(centres):
        raise ValueError('at least one center has to be given')
    height, width = segm.shape
    labels_fg_prob = np.asarray(labels_fg_prob, float)
    labels_bg_prob = 1.0 - labels_fg_prob
    centres = [np.round(c).astype(int) for c in centres]
    nb_cls = len(centres) + 1

    proba = np.ones((height, width, nb_cls))
    proba[:, :, 0] = labels_bg_prob[segm]
    for i in range(len(centres)):
        proba[:, :, i + 1] = labels_fg_prob[segm]

    shape = np.ones((height, width, nb_cls))
    if coef_shape > 0:
        shape_mean, shape_std = shape_mean_std
        shape[:, :, 0] = labels_bg_prob[segm]
        grid_r, grid_c = np.meshgrid(np.arange(height), np.arange(width),
                                     indexing='ij')
        for i, centre in enumerate(centres):
            dist = np.sqrt((grid_r - centre[0]) ** 2 + (grid_c - centre[1]) ** 2)
            cdf = np.asarray(sp_ops.norm_cdf(
                jnp.arange(int(np.max(dist) + 1), dtype=jnp.float32),
                float(shape_mean), float(shape_std)))
            cum = 1.0 - cdf + 1e-9
            shape[:, :, i + 1] = cum[dist.astype(int)]

    unary = -np.log(proba) - coef_shape * np.log(shape)
    for i, pos in enumerate(centres):
        if seed_size > 0:
            from pyimsegm_tpu.ops.morphology import disk
            selem = np.asarray(disk(seed_size), bool)
            mask = np.zeros(segm.shape, dtype=bool)
            mask[pos[0] - seed_size:pos[0] + seed_size + 1,
                 pos[1] - seed_size:pos[1] + seed_size + 1] = selem
            mask &= segm > 0
            unary[mask, i + 1] = 0
        else:
            unary[pos[0], pos[1], i + 1] = 0

    pairwise = (1 - np.eye(nb_cls)) * gc_regul
    edges = _grid_edges(height, width)
    if np.isscalar(gc_regul) and gc_regul <= 0:
        segm_obj = np.argmin(unary, axis=-1).astype(np.int32)
    else:
        # pixel-scale graph (H*W nodes): fewer/cheaper expansion chains
        out = solve_mrf(
            jnp.asarray(unary.reshape(-1, nb_cls), jnp.float32),
            jnp.asarray(edges), jnp.ones(len(edges), jnp.float32),
            jnp.asarray(pairwise, jnp.float32),
            n_expand_rounds=4, n_chains=2)
        segm_obj = np.asarray(out).reshape(height, width).astype(np.int32)

    if debug_visual is not None:
        debug_visual['unary_imgs'] = [unary[:, :, i]
                                      for i in range(unary.shape[-1])]
    return segm_obj


logging.getLogger(__name__).addHandler(logging.NullHandler())
