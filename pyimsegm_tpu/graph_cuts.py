"""GraphCut-stage API matching `imsegm.graph_cuts`
(`/root/reference/imsegm/graph_cuts.py`).

Thin facade over the device implementations: class-model estimation lives in
`pyimsegm_tpu.models.class_model`, the MRF solver and cost construction in
`pyimsegm_tpu.ops.graphcut`.
"""

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
