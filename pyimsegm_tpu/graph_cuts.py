"""GraphCut-stage API matching `imsegm.graph_cuts`
(`/root/reference/imsegm/graph_cuts.py`).

Thin facade over the device implementations: class-model estimation lives in
`pyimsegm_tpu.models.class_model`, the MRF solver and cost construction in
`pyimsegm_tpu.ops.graphcut`.
"""

import logging

import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.models.class_model import (  # noqa: F401  (re-export)
    estim_class_model,
)
from pyimsegm_tpu.models.gmm import (  # noqa: F401
    gmm_fit_from_labels,
)
from pyimsegm_tpu.models.otsu import (  # noqa: F401
    compute_multivariate_otsu,
)
from pyimsegm_tpu.ops.graphcut import (  # noqa: F401
    MAX_PAIRWISE_COST,
    MIN_UNARY_PROB,
    compute_edge_weights,
    compute_pairwise_cost,
    compute_pairwise_cost_from_transitions,
    compute_unary_cost,
    count_label_transitions_connected_segments,
    create_pairwise_matrix,
    create_pairwise_matrix_uniform,
    solve_mrf,
)
from pyimsegm_tpu.ops.graphcut import (
    segment_graph_cut_general as _segment_graph_cut_core,
)

#: alias kept for reference-name parity (`graph_cuts.py:166`)
compute_multivarian_otsu = compute_multivariate_otsu


def compute_spatial_dist(centres, edges, relative=False):
    """Distance between adjacent superpixel centres
    (`graph_cuts.py:303-336`); host list API."""
    centres = np.asarray(centres, float)
    edges = np.asarray(edges, int)
    d = centres[edges[:, 0]] - centres[edges[:, 1]]
    dist = np.sqrt(np.sum(d * d, axis=1))
    if relative:
        dist = dist / np.mean(dist)
    return dist


def get_vertexes_edges(segments):
    """(vertices, edges) of the superpixel adjacency
    (`graph_cuts.py:288-300`)."""
    from pyimsegm_tpu.superpixels import make_graph_segm_connect_grid2d_conn4
    return make_graph_segm_connect_grid2d_conn4(np.asarray(segments))


def estim_gmm_params(features, prob):
    """Mean/covariance/weights from soft responsibilities
    (`graph_cuts.py:43-70`)."""
    features = np.asarray(features, float)
    prob = np.asarray(prob, float)
    weights = prob.mean(axis=0)
    means, covars = [], []
    for i in range(prob.shape[1]):
        w = prob[:, i:i + 1]
        tot = max(w.sum(), 1e-12)
        mu = (features * w).sum(axis=0) / tot
        diff = features - mu
        cov = (diff * w).T @ diff / tot
        means.append(mu)
        covars.append(cov)
    return {'weights': weights.tolist(), 'means': np.array(means),
            'covars': np.array(covars)}


def estim_class_model_gmm(features, nb_classes, init='kmeans'):
    """GMM over features, k-means seeded by default
    (`graph_cuts.py:221-249`); returns a model with ``predict_proba``.

    >>> rng = np.random.default_rng(0)
    >>> fts = np.vstack([rng.random((50, 3)) - 1, rng.random((50, 3)) + 1])
    >>> mm = estim_class_model_gmm(fts, 2)
    >>> np.asarray(mm.predict_proba(fts)).shape
    (100, 2)
    """
    model_name = 'GMM_kmeans' if init == 'kmeans' else 'GMM'
    return estim_class_model(features, nb_classes, estim_model=model_name,
                             use_scaler=False)


def estim_class_model_kmeans(features, nb_classes, init_type='k-means++',
                             max_iter=99):
    """k-means clustering + one-shot Gaussian fit per cluster
    (`graph_cuts.py:252-287`).

    :returns: (model with ``predict_proba``, (N,) hard cluster labels)
    """
    import jax

    from pyimsegm_tpu.models import gmm as gmm_mod
    from pyimsegm_tpu.models.class_model import ClassModel
    x = jnp.asarray(np.asarray(features), jnp.float32)
    w = jnp.ones((x.shape[0],), jnp.float32)
    key = jax.random.PRNGKey(0)
    if init_type == 'quantiles':
        centers = gmm_mod.quantile_init_centers(x, nb_classes)
        _, y = gmm_mod.kmeans_fit(key, x, w, nb_classes, n_iter=2,
                                  init_centers=centers)
    else:
        _, y = gmm_mod.kmeans_fit(key, x, w, nb_classes, n_iter=max_iter)
    params = gmm_mod.gmm_fit_from_labels(x, y, w, nb_classes, max_iter=1)
    model = ClassModel(None, None, None, None, None, params)
    return model, np.asarray(y)


def compute_edge_model(edges, proba, metric='lT'):
    """Edge weights from the per-vertex probability space
    (`graph_cuts.py:383-438`): ``exp(-dist / (2 std(dist)^2))`` with dist =
    paired L1 / L2 / max-channel squared difference.

    >>> proba = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]])
    >>> w = compute_edge_model(np.array([[0, 1], [1, 2]]), proba, 'l1')
    >>> bool(w[0] > w[1])
    True
    """
    edges = np.asarray(edges, int)
    proba = np.asarray(proba, float)
    if np.max(edges) >= len(proba):
        raise ValueError('max vertex %i exceeds size of proba %r'
                         % (np.max(edges), proba.shape))
    v1, v2 = proba[edges[:, 0]], proba[edges[:, 1]]
    if metric == 'l1':
        dist = np.sum(np.abs(v1 - v2), axis=1)
    elif metric == 'l2':
        dist = np.sqrt(np.sum((v1 - v2) ** 2, axis=1))
    elif metric == 'lT':
        dist = np.max((v1 - v2) ** 2, axis=1)
    else:
        logging.error('not implemented for: %s', metric)
        return np.ones(len(edges))
    return np.exp(-dist / (2 * np.std(dist) ** 2))


def create_pairwise_matrix_specif(pos_weights, nb_classes=None):
    """Pairwise matrix with specific off-diagonal entries, 1 elsewhere
    (`graph_cuts.py:459-486`).

    >>> create_pairwise_matrix_specif([((1, 2), 0.5), ((1, 0), 0.7)], 4)
    array([[0. , 0.7, 1. , 1. ],
           [0.7, 0. , 0.5, 1. ],
           [1. , 0.5, 0. , 1. ],
           [1. , 1. , 1. , 0. ]])
    """
    if nb_classes is None:
        nb_classes = int(max(max(i, j) for (i, j), _ in pos_weights)) + 1
    mat = np.ones((nb_classes, nb_classes)) - np.eye(nb_classes)
    for (i, j), w in pos_weights:
        mat[i, j] = w
        mat[j, i] = w
    return mat


def insert_gc_debug_images(debug_visual, segments, graph_labels, unary_cost,
                           edges, edge_weights):
    """Stash intermediate MRF variables for visual debugging
    (`graph_cuts.py:558-572`)."""
    if debug_visual is None:
        return
    from pyimsegm_tpu.superpixels import superpixel_centers
    from pyimsegm_tpu.utils.drawing import (
        draw_graphcut_unary_cost_segments,
        draw_graphcut_weighted_edges,
    )
    segments = np.asarray(segments)
    debug_visual['segments'] = segments
    debug_visual['edges'] = np.asarray(edges)
    debug_visual['edge_weights'] = np.asarray(edge_weights)
    debug_visual['imgs_unary_cost'] = draw_graphcut_unary_cost_segments(
        segments, np.asarray(unary_cost))
    centres = superpixel_centers(segments)
    debug_visual['img_graph_edges'] = draw_graphcut_weighted_edges(
        segments, centres, np.asarray(edges), np.asarray(edge_weights),
        img_bg=debug_visual.get('slic_mean', None))


def segment_graph_cut_general(slic, proba, image=None, features=None,
                              gc_regul=1.0, edge_type='model', edge_cost=1.0,
                              debug_visual=None):
    """End-to-end MRF stage with the reference signature
    (`graph_cuts.py:660-747`); returns (K,) labels per superpixel."""
    slic = np.asarray(slic)
    k = int(slic.max()) + 1
    proba_j = jnp.asarray(np.asarray(proba), jnp.float32)
    out = _segment_graph_cut_core(
        jnp.asarray(slic), proba_j, k,
        image=None if image is None else jnp.asarray(np.asarray(image),
                                                     jnp.float32),
        features=None if features is None else jnp.asarray(
            np.asarray(features), jnp.float32),
        gc_regul=gc_regul, edge_type=edge_type, edge_cost=edge_cost)
    if debug_visual is not None:
        from pyimsegm_tpu.ops.graphcut import compute_unary_cost as _unary
        unary = np.asarray(_unary(proba_j))
        debug_visual['imgs_unary_cost'] = [unary[:, i][slic]
                                           for i in range(unary.shape[1])]
    return np.asarray(out)
