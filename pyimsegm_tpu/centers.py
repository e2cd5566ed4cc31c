"""Object (egg) centre detection: candidate features, classification,
density clustering, evaluation.

Library layer for the reference's center-detection experiment chain
(`/root/reference/experiments_ovary_centres/run_center_candidate_training.py`,
`run_center_prediction.py`, `run_center_clustering.py`,
`run_center_evaluation.py`): SLIC centres become candidate points; features
are concentric-annuli label histograms (one batched disk-sum pass on device,
`pyimsegm_tpu.ops.histogram`) plus ray features (one batched ladder march,
`pyimsegm_tpu.ops.ray`); an on-device classifier scores the candidates and
DBSCAN merges positive ones into final centres.
"""

import logging

import numpy as np

from pyimsegm_tpu.classification import (
    Classifier,
    balance_dataset_by_,
    create_classif_search_train_export,
)
from pyimsegm_tpu.models.clustering import dbscan, pairwise_dist2
from pyimsegm_tpu.ops.histogram import compute_label_histograms_positions
from pyimsegm_tpu.ops.ray import compute_ray_features_positions, shift_ray_features

#: default parameters of the center-detection chain
#: (`run_center_candidate_training.py:83-105`)
CENTER_PARAMS = {
    'slic_size': 25,
    'slic_regul': 0.3,
    'fts_hist_diams': [10, 50, 100, 200, 300],
    'fts_ray_step': 15,
    'fts_ray_types': [('up', [0])],
    'fts_ray_closer': True,
    'fts_ray_smooth': 0,
    'pca_coef': None,
    'balance': 'unique',
    'classif': 'RandForest',
    'nb_classif_search': 50,
    'dict_relabel': None,
    'center_dist_thr': 50,
    # positive-class probability threshold for candidate detection; the
    # reference uses plain argmax (= 0.5 for the binary case,
    # `run_center_prediction.py:54-91`) — 0.3 measures substantially better
    # recall at equal precision on the bundled ovary data (see QUALITY.md)
    'detect_proba_thr': 0.3,
}

#: DBSCAN defaults (`run_center_clustering.py:46-49`)
CLUSTER_PARAMS = {
    'DBSCAN_max_dist': 50,
    'DBSCAN_min_samples': 1,
}


def compute_points_features(segm, points, params):
    """Feature matrix for candidate points
    (`run_center_candidate_training.py:400-446`): annuli label histograms per
    diameter + ray features per (edge, border-labels) type, optionally taking
    the per-angle minimum over types before phase alignment.

    :returns: (features (P, F), names)
    """
    points = np.asarray(points)
    features = np.empty((len(points), 0))
    feature_names = []

    if params.get('fts_hist_diams') is not None:
        hist, names_hist = compute_label_histograms_positions(
            np.asarray(segm), points.astype(int),
            diameters=tuple(params['fts_hist_diams']))
        features = np.hstack((features, np.asarray(hist)))
        feature_names += names_hist

    if params.get('fts_ray_step') is not None:
        ray_types = params.get('fts_ray_types', [('up', [0])])
        perform_closer = params.get('fts_ray_closer', False) \
            and len(ray_types) > 1
        shifting = not perform_closer
        list_rays, names_ray = [], []
        for ray_edge, ray_border in ray_types:
            rays, _, names_ray = compute_ray_features_positions(
                np.asarray(segm), points,
                angle_step=params['fts_ray_step'], edge=ray_edge,
                border_labels=ray_border,
                smooth_ray=params.get('fts_ray_smooth', 0),
                shifting=shifting)
            if perform_closer:
                list_rays.append(rays)
            else:
                features = np.hstack((features, rays))
                feature_names += names_ray
        if perform_closer:
            closest = np.min(np.array(list_rays), axis=0)
            rays = np.array([shift_ray_features(r)[0] for r in closest])
            features = np.hstack((features, rays))
            feature_names += names_ray

    return features, feature_names


def estim_points_compute_features(name, img, segm, params):
    """Candidate points (SLIC centres) + their features
    (`run_center_candidate_training.py:378-397`)."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import graph as graph_ops
    from pyimsegm_tpu.ops.slic import segment_slic_img2d
    if img.shape[:2] != segm.shape[:2]:
        from pyimsegm_tpu.utils import ImageDimensionError
        raise ImageDimensionError('not matching shapes: %r : %r'
                                  % (img.shape, segm.shape))
    slic = np.asarray(segment_slic_img2d(
        img, sp_size=params['slic_size'],
        relative_compact=params['slic_regul']))
    k = int(slic.max()) + 1
    centers = np.asarray(graph_ops.superpixel_centers(jnp.asarray(slic), k))
    features, names = compute_points_features(segm, centers, params)
    return name, slic, centers, features, names


def compute_min_dist_2_centers(centers, points):
    """Min distance and argmin centre per point
    (`run_center_candidate_training.py:447-455`)."""
    d2 = np.asarray(pairwise_dist2(np.asarray(points, float),
                                   np.asarray(centers, float)))
    return np.sqrt(d2.min(axis=1)), d2.argmin(axis=1)


def label_close_points(centers, points, params):
    """Candidate labels: 1 within ``center_dist_thr`` of a true centre, or a
    lookup into a centre-annotation mask
    (`run_center_candidate_training.py:456-480`)."""
    if isinstance(centers, list):
        if not centers:
            return np.zeros(len(points), dtype=int)
        min_dist, _ = compute_min_dist_2_centers(centers, points)
        labels = (min_dist <= params['center_dist_thr']).astype(int)
    elif isinstance(centers, np.ndarray):
        mx = np.asarray(points, int)
        labels = centers[mx[:, 0], mx[:, 1]]
    else:
        logging.warning('not relevant centers info of type "%s"', type(centers))
        labels = np.full(len(points), -1)
    return np.asarray(labels)


def train_center_classifier(list_segms, list_imgs, list_centers, params=None,
                            path_out=None):
    """Full training stage: per-image candidates + features + labels, 'unique'
    balancing, randomised hyper-parameter search, final fit
    (`run_center_candidate_training.py:483-737` condensed).

    :returns: (fitted Classifier, dict with per-image point data)
    """
    params = dict(CENTER_PARAMS, **(params or {}))
    dict_imgs = {}
    all_fts, all_lbs = [], []
    for i, (img, segm, centers) in enumerate(
            zip(list_imgs, list_segms, list_centers)):
        name = 'img_%03d' % i
        _, slic, points, fts, names = estim_points_compute_features(
            name, img, segm, params)
        labels = label_close_points(list(map(tuple, centers)), points, params)
        dict_imgs[name] = {'slic': slic, 'points': points, 'features': fts,
                           'labels': labels}
        all_fts.append(fts)
        all_lbs.append(labels)
    features = np.concatenate(all_fts)
    labels = np.concatenate(all_lbs)
    if params.get('balance'):
        features, labels = balance_dataset_by_(
            features, labels, balance_type=params['balance'])
    classif, _ = create_classif_search_train_export(
        params['classif'], features, labels,
        nb_search_iter=min(params.get('nb_classif_search', 1), 10),
        pca_coef=params.get('pca_coef'), path_out=path_out)
    return classif, dict_imgs


def detect_center_candidates(name, img, segm, centers_gt, slic, points,
                             features, params, classif: Classifier):
    """Classify candidate points and keep the positives
    (`run_center_prediction.py:54-91`); a ``detect_proba_thr`` below 0.5
    trades precision for recall on the positive class.

    :returns: (candidate points (P, 2), labels (P,))
    """
    thr = (params or {}).get('detect_proba_thr', 0.5)
    classes = list(np.asarray(classif.classes_))
    if thr != 0.5 and 1 in classes:
        proba = classif.predict_proba(features)
        labels = (proba[:, classes.index(1)] >= thr).astype(int)
    else:
        labels = classif.predict(features)
    candidates = np.asarray(points)[np.asarray(labels) == 1]
    return candidates, labels


def cluster_center_candidates(points, max_dist=100, min_samples=1):
    """DBSCAN merge of positive candidates into final centres
    (`run_center_clustering.py:61-88`).

    :returns: (centres (C, 2), cluster labels per point; -1 = noise)
    """
    points = np.asarray(points, float)
    if len(points) == 0:
        return points, []
    labels = dbscan(points, eps=max_dist, min_samples=min_samples)
    centers = [np.mean(points[labels == i], axis=0)
               for i in range(labels.max() + 1) if np.any(labels == i)]
    return np.array(centers), labels


def _detect_core_fn():
    """Build the jitted one-program detection core lazily (keeps the module
    importable without jax side effects at import time)."""
    import functools

    import jax
    import jax.numpy as jnp

    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.grid import enforce_grid_connectivity
    from pyimsegm_tpu.ops.histogram import label_hist_maps
    from pyimsegm_tpu.ops.ray import (ray_features_positions_core,
                                      shift_ray_features_batched)

    @functools.partial(
        jax.jit,
        static_argnames=('clf_apply', 'cfg', 'compactness', 'nb_labels',
                         'diameters', 'angle_step', 'border_labels', 'thr',
                         'eps', 'pos_idx'))
    def _detect_core(img, segm, clf_arrays, *, clf_apply, cfg, compactness,
                     nb_labels, diameters, angle_step, border_labels, thr,
                     eps, pos_idx):
        """SLIC candidates -> annuli hists + aligned rays -> classifier ->
        threshold -> DBSCAN components, in ONE XLA program (the eager chain
        paid a host<->device round-trip per stage,
        `run_center_prediction.py:54-91` semantics throughout)."""
        from pyimsegm_tpu.models.clustering import pairwise_dist2
        from pyimsegm_tpu.pipelines import _grid_geometry

        labels = slic_ops.slic_segment(img, cfg, compactness)
        labels = enforce_grid_connectivity(
            labels, cfg, min_size=int(0.5 * cfg.step * cfg.step))
        counts, centers = _grid_geometry(labels, cfg)
        p = cfg.n_segments
        valid = counts > 0

        h, w = segm.shape[:2]
        # annuli label histograms gathered at the (truncated-int) centres
        cmaps, smaps = label_hist_maps(segm, nb_labels, diameters)
        pos_i = centers.astype(jnp.int32)
        py = jnp.clip(pos_i[:, 0], 0, h - 1)
        px = jnp.clip(pos_i[:, 1], 0, w - 1)
        c_at = cmaps[:, :, py, px]                      # (n_diam, L, P)
        s_at = smaps[:, py, px]                         # (n_diam, P)
        feats = []
        prev_c = jnp.zeros_like(c_at[0])
        prev_s = jnp.zeros_like(s_at[0])
        for i in range(len(diameters)):
            ring = (c_at[i] - prev_c) / jnp.maximum(s_at[i] - prev_s,
                                                    1.0)[None]
            feats.append(ring.T)
            prev_c, prev_s = c_at[i], s_at[i]
        hists = jnp.concatenate(feats, axis=1)

        seg_binary = jnp.zeros(segm.shape[:2], bool)
        for lb in border_labels:
            seg_binary = seg_binary | (segm == lb)
        rays = ray_features_positions_core(seg_binary, centers,
                                           angle_step=angle_step, edge='up')
        rays, _shifts = shift_ray_features_batched(rays)

        features = jnp.nan_to_num(
            jnp.concatenate([hists, rays], axis=1))
        proba = clf_apply(clf_arrays, features)
        cand = (proba[:, pos_idx] >= thr) & valid

        # DBSCAN with min_samples=1 == connected components of the eps-graph
        # over candidates: iterated min-label propagation to a fixed point
        d2 = pairwise_dist2(centers)
        adj = (d2 <= eps * eps) & cand[:, None] & cand[None, :]
        lab0 = jnp.where(cand, jnp.arange(p, dtype=jnp.int32), p)

        def cond(state):
            return state[1]

        def body(state):
            lab, _ = state
            nl = jnp.min(jnp.where(adj, lab[None, :], p), axis=1)
            nl = jnp.minimum(lab, nl)
            return nl, jnp.any(nl != lab)

        comp, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
        return labels, centers, valid, cand, comp

    return _detect_core


_DETECT_CORE = None


def load_compute_detect_centers(img, segm, classif, params=None):
    """One-image prediction chain: candidates -> classify -> cluster
    (`run_center_prediction.py:54-91`).

    With a fitted :class:`~pyimsegm_tpu.classification.Classifier` and the
    default single-ray-type feature recipe the whole chain runs as ONE
    jitted program (see ``_detect_core_fn``); other configurations take the
    stage-by-stage path.

    :returns: dict with slic, points, candidates, clustered centres
    """
    merged = dict(CENTER_PARAMS)
    merged.update(CLUSTER_PARAMS)
    merged.update(params or {})
    params = merged

    ray_types = params.get('fts_ray_types', [('up', [0])])
    fused_ok = (hasattr(classif, 'device_predict_fn')
                and getattr(classif, '_params', None) is not None
                and len(ray_types) == 1 and ray_types[0][0] == 'up'
                and not params.get('fts_ray_smooth', 0)
                and params.get('fts_hist_diams') is not None
                and params.get('fts_ray_step') is not None
                and 1 in list(np.asarray(classif.classes_)))
    if fused_ok:
        import jax.numpy as jnp

        from pyimsegm_tpu.ops import slic as slic_ops

        global _DETECT_CORE
        if _DETECT_CORE is None:
            _DETECT_CORE = _detect_core_fn()
        segm = np.asarray(segm).astype(np.int32)
        cfg = slic_ops.slic_config(img.shape[0], img.shape[1],
                                   params['slic_size'])
        m = slic_ops.compactness_from_regul(params['slic_size'],
                                            params['slic_regul'])
        clf_apply, clf_arrays = classif.device_predict_fn()
        classes = list(np.asarray(classif.classes_))
        labels, centers, valid, cand, comp = _DETECT_CORE(
            jnp.asarray(img), jnp.asarray(segm), clf_arrays,
            clf_apply=clf_apply, cfg=cfg, compactness=m,
            nb_labels=int(segm.max()) + 1,
            diameters=tuple(params['fts_hist_diams']),
            angle_step=float(params['fts_ray_step']),
            border_labels=tuple(ray_types[0][1]),
            thr=float(params.get('detect_proba_thr', 0.5)),
            eps=float(params['DBSCAN_max_dist']),
            pos_idx=classes.index(1))
        for arr in (labels, centers, valid, cand, comp):
            arr.copy_to_host_async()
        centers_np = np.asarray(centers)
        valid_np = np.asarray(valid)
        cand_np = np.asarray(cand)
        comp_np = np.asarray(comp)
        candidates = centers_np[cand_np]
        comps = comp_np[cand_np]
        uniq = np.unique(comps)
        centres_out = np.array([centers_np[cand_np][comps == u].mean(axis=0)
                                for u in uniq]) if len(uniq) else \
            np.zeros((0, 2))
        remap = {u: i for i, u in enumerate(uniq)}
        clust_labels = np.array([remap[u] for u in comps], dtype=int)
        return {'slic': np.asarray(labels), 'points': centers_np[valid_np],
                'candidates': candidates, 'centers': centres_out,
                'clust_labels': clust_labels}

    _, slic, points, features, _ = estim_points_compute_features(
        '', img, segm, params)
    candidates, labels = detect_center_candidates(
        '', img, segm, None, slic, points, features, params, classif)
    centers, clust_labels = cluster_center_candidates(
        candidates, max_dist=params['DBSCAN_max_dist'],
        min_samples=params['DBSCAN_min_samples'])
    return {'slic': slic, 'points': points, 'candidates': candidates,
            'centers': centers, 'clust_labels': clust_labels}


def evaluate_detected_centers(centers_detected, centers_true, dist_thr=50):
    """Detection statistics within a distance tolerance
    (`run_center_evaluation.py:86-189` condensed).

    :returns: dict with TP / FP / FN, precision, recall, f1
    """
    centers_detected = np.asarray(centers_detected, float)
    centers_true = np.asarray(centers_true, float)
    if len(centers_detected) == 0:
        fn = len(centers_true)
        return {'TP': 0, 'FP': 0, 'FN': fn, 'precision': 0.0, 'recall': 0.0,
                'f1': 0.0}
    if len(centers_true) == 0:
        return {'TP': 0, 'FP': len(centers_detected), 'FN': 0,
                'precision': 0.0, 'recall': 0.0, 'f1': 0.0}
    d2 = np.asarray(pairwise_dist2(centers_detected, centers_true))
    matched_true = np.sqrt(d2.min(axis=0)) <= dist_thr
    matched_det = np.sqrt(d2.min(axis=1)) <= dist_thr
    tp = int(matched_true.sum())
    fn = int((~matched_true).sum())
    fp = int((~matched_det).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {'TP': tp, 'FP': fp, 'FN': fn, 'precision': precision,
            'recall': recall, 'f1': f1}
