"""Public segmentation pipelines (the stable API of the framework).

Mirrors the reference's public surface (`/root/reference/imsegm/pipelines.py`):

* :func:`pipe_color2d_slic_features_model_graphcut` — unsupervised single image
* :func:`estim_model_classes_group` — fit one model over an image group
* :func:`segment_color2d_slic_features_model_graphcut` — predict w/ fitted model
* :func:`train_classif_color2d_slic_features` — supervised training
* :func:`pipe_gray3d_slic_features_model_graphcut` — 3D gray volumes

Unlike the reference (which fans images out over a ``multiprocessing.Pool``,
`pipelines.py:142-147,337-342`), each pipeline here is a single jitted XLA
program per image geometry — SLIC, features, model fit, and the MRF solver all
fuse on device — and batching over images uses ``jax.vmap`` /
``jax.shard_map`` over a device mesh (see ``pyimsegm_tpu.parallel``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu import descriptors
from pyimsegm_tpu.models.class_model import ClassModel, estim_class_model
from pyimsegm_tpu.ops import graphcut
from pyimsegm_tpu.ops import slic as slic_ops

#: default number of classes left out in group cross-validation
CROSS_VAL_LEAVE_OUT = 2


def _features_spec(dict_features):
    """Hashable (static) form of the feature dict for jit keying."""
    return tuple((k, tuple(v)) for k, v in dict_features.items())


# ------------------------------------------------------------------ core ---

_MOMENT_FLAGS = ('mean', 'std', 'energy')


def _fusable_color_spec(feats_spec):
    """A single color-space key whose stats are all plain moments can ride
    the fused SLIC kernel pass; returns the key or None."""
    if len(feats_spec) != 1:
        return None
    key, flags = feats_spec[0]
    if not key.startswith('color') or not flags:
        return None
    if any(f not in _MOMENT_FLAGS for f in flags):
        return None
    return key


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'feats_spec', 'slico', 'n_iter', 'connectivity'))
def _slic_features_core(image, cfg, feats_spec, compactness,
                        slico=False, n_iter=slic_ops.DEFAULT_SLIC_ITERS,
                        connectivity=True):
    fuse_key = None if (slico or jnp.ndim(image) != 3) \
        else _fusable_color_spec(feats_spec)
    if connectivity:
        # reference semantics: superpixels are always connected
        # (`superpixels.py:61-63` enforce_connectivity=True); the device
        # enforcement pass replaces the fused final-assignment shortcut, so
        # geometry/moments are re-reduced from the enforced labels
        from pyimsegm_tpu.ops import grid as grid_ops
        if fuse_key is not None:
            # the fused final SLIC pass emits the raw-label geometry as a
            # byproduct — its centroids seed the connectivity anchors, so
            # enforcement skips one full-image segment reduction
            from pyimsegm_tpu.ops import color as color_ops
            img_f = jnp.asarray(image, jnp.float32)
            feat_img = (color_ops.convert_img_color_from_rgb(
                img_f, fuse_key.split('_')[-1]) if '_' in fuse_key else img_f)
            labels, _cnt_raw, cent_raw, _ms_raw = \
                slic_ops.slic_segment_with_features(
                    image, feat_img, cfg, compactness, n_iter=n_iter)
            labels, sums = grid_ops.enforce_minsize_with_moments(
                labels, cfg, int(0.5 * cfg.step * cfg.step), cent_raw,
                feat_img)
            counts = sums[:, 6]
            safe = jnp.maximum(counts[:, None], 1.0)
            centers = sums[:, 7:9] / safe
            mean = sums[:, :3] / safe
            energy = sums[:, 3:6] / safe
            flags = dict(feats_spec)[fuse_key]
            blocks = {'mean': mean,
                      'std': jnp.sqrt(jnp.maximum(energy - mean * mean, 0.0)),
                      'energy': energy}
            features = jnp.concatenate(
                [blocks[f] for f in _MOMENT_FLAGS if f in flags], axis=-1)
            return labels, features, counts, centers
        labels = slic_ops.slic_segment(image, cfg, compactness,
                                       n_iter=n_iter, slico=slico)
        labels = grid_ops.enforce_grid_connectivity(
            labels, cfg, min_size=int(0.5 * cfg.step * cfg.step))
        counts, centers = _grid_geometry(labels, cfg)
    elif slico:
        labels = slic_ops.slic_segment(image, cfg, compactness,
                                       n_iter=n_iter, slico=True)
        counts, centers = _grid_geometry(labels, cfg)
    elif fuse_key is not None:
        # fully fused final pass: labels + geometry + color moment sums
        from pyimsegm_tpu.ops import color as color_ops
        img_f = jnp.asarray(image, jnp.float32)
        feat_img = (color_ops.convert_img_color_from_rgb(
            img_f, fuse_key.split('_')[-1]) if '_' in fuse_key else img_f)
        labels, counts, centers, msums = slic_ops.slic_segment_with_features(
            image, feat_img, cfg, compactness, n_iter=n_iter)
        flags = dict(feats_spec)[fuse_key]
        safe = jnp.maximum(counts[:, None], 1.0)
        mean = msums[:, :3] / safe
        energy = msums[:, 3:6] / safe
        blocks = {'mean': mean,
                  'std': jnp.sqrt(jnp.maximum(energy - mean * mean, 0.0)),
                  'energy': energy}
        features = jnp.concatenate(
            [blocks[f] for f in _MOMENT_FLAGS if f in flags], axis=-1)
        return labels, features, counts, centers
    else:
        # fused path: counts/centres fall out of the final SLIC kernel pass
        labels, counts, centers = slic_ops.slic_segment_with_geometry(
            image, cfg, compactness, n_iter=n_iter)
    seg_ids = labels.ravel()
    k = cfg.n_segments
    features, _ = descriptors.compute_selected_features_img2d(
        jnp.asarray(image, jnp.float32), seg_ids, k, dict(feats_spec),
        grid_ctx=(labels, cfg))
    return labels, features, counts, centers


def _grid_geometry(labels, cfg):
    """One fused reduce for per-superpixel pixel counts and centres."""
    from pyimsegm_tpu.ops.grid import grid_segment_sum
    h, w = labels.shape
    coords = jnp.stack(
        [jnp.ones((h, w), jnp.float32),
         jax.lax.broadcasted_iota(jnp.float32, (h, w), 0),
         jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)], axis=-1)
    sums = grid_segment_sum(coords, labels, cfg)
    counts = sums[:, 0]
    centers = sums[:, 1:] / jnp.maximum(counts[:, None], 1.0)
    return counts, centers


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'feats_spec', 'nb_classes', 'estim_model',
                     'pca_coef', 'use_scaler', 'gc_regul', 'gc_edge_type',
                     'seed'))
def _pipe_unsup_core(image, *, cfg, feats_spec, nb_classes, estim_model,
                     pca_coef, use_scaler, gc_regul, gc_edge_type,
                     compactness, seed=0):
    # one jitted program: SLIC -> features -> GMM-EM fit -> proba -> MRF ->
    # upsample, all on device (running this eagerly costs ~30x in per-op
    # dispatch latency: 345 ms vs ~11 ms device time on the config-1 image)
    labels, features, counts, centers = _slic_features_core(
        image, cfg, feats_spec, compactness)
    mask = (counts > 0).astype(jnp.float32)
    model = estim_class_model(features, nb_classes, estim_model, pca_coef,
                              use_scaler, sample_weight=mask, seed=seed)
    proba = model.predict_proba(features)
    from pyimsegm_tpu.ops.grid import grid_lookup
    segm_soft = grid_lookup(proba, labels, cfg)
    graph_labels = graphcut.segment_graph_cut_general(
        labels, proba, cfg.n_segments, image=jnp.asarray(image, jnp.float32),
        features=features, gc_regul=gc_regul, edge_type=gc_edge_type,
        grid_ctx=(labels, cfg), centers=centers)
    segm = grid_lookup(graph_labels, labels, cfg)
    return segm, segm_soft, labels, features, proba, model, graph_labels


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'feats_spec', 'gc_regul', 'gc_edge_type',
                     'connectivity'))
def _segment_with_model_core(image, model: ClassModel, *, cfg, feats_spec,
                             gc_regul, gc_edge_type, compactness,
                             connectivity=True):
    labels, features, counts, centers = _slic_features_core(
        image, cfg, feats_spec, compactness, connectivity=connectivity)
    proba = model.predict_proba(features)
    from pyimsegm_tpu.ops.grid import grid_lookup
    segm_soft = grid_lookup(proba, labels, cfg)
    graph_labels = graphcut.segment_graph_cut_general(
        labels, proba, cfg.n_segments, image=jnp.asarray(image, jnp.float32),
        features=features, gc_regul=gc_regul, edge_type=gc_edge_type,
        grid_ctx=(labels, cfg), centers=centers)
    segm = grid_lookup(graph_labels, labels, cfg)
    return segm, segm_soft, labels, proba, graph_labels


@functools.partial(
    jax.jit,
    static_argnames=('clf_apply', 'cfg', 'feats_spec', 'gc_regul',
                     'gc_edge_type', 'connectivity'))
def _segment_with_classif_core(image, clf_arrays, *, clf_apply, cfg,
                               feats_spec, gc_regul, gc_edge_type,
                               compactness, connectivity=True):
    """One jitted program for the supervised predict path: SLIC -> features
    (incl. texture banks) -> classifier predict -> MRF solve, all on device.

    ``clf_apply``/``clf_arrays`` come from
    :meth:`pyimsegm_tpu.classification.Classifier.device_predict_fn` — the
    closure is cached per fitted classifier, so repeated predictions reuse
    one compiled program.  Replaces the round-3/4 eager composition whose
    host<->device round-trips (features fetch, proba upload, eager graphcut
    glue, full-res label fetch) dominated BASELINE config-2 latency.
    """
    labels, features, _counts, centers = _slic_features_core(
        image, cfg, feats_spec, compactness, connectivity=connectivity)
    proba = clf_apply(clf_arrays, jnp.nan_to_num(features))
    graph_labels = graphcut.segment_graph_cut_general(
        labels, proba, cfg.n_segments, image=jnp.asarray(image, jnp.float32),
        features=features, gc_regul=gc_regul, edge_type=gc_edge_type,
        grid_ctx=(labels, cfg), centers=centers)
    return labels, proba, graph_labels


def _fetch_reconstruct(labels, proba, graph_labels, cfg):
    """Host-side reconstruction of (segm, segm_soft) from the compact
    factors: fetch (H, W) labels (uint16 when K allows) plus the (K,)/(K, C)
    tables and gather on host.  Value-identical to fetching the device
    ``grid_lookup`` outputs, at ~5x less tunnel traffic — host<->device
    transfer dominates single-image latency (BASELINE config 1).

    Precondition: ``labels`` must come from the *enforced* (connectivity=True)
    grid path, where ``grid_lookup(t, labels) == t[labels]`` holds exactly
    (asserted in the suite).  Wrappers running with ``connectivity=False``
    must fetch the device ``grid_lookup`` outputs instead (the raw/absorbed
    label plane may hold rare out-of-window pixels, for which ``grid_lookup``
    returns 0 rather than ``t[label]``)."""
    small = labels.astype(jnp.uint16) if cfg.n_segments <= 0xffff else labels
    for arr in (small, proba, graph_labels):
        arr.copy_to_host_async()
    labels_np = np.asarray(small).astype(np.int64)
    segm_np = np.asarray(graph_labels)[labels_np]
    soft_np = np.asarray(proba)[labels_np]
    return segm_np, soft_np


# ------------------------------------------------------------- public API ---

def compute_color2d_superpixels_features(image, dict_features, sp_size=30,
                                         sp_regul=0.2):
    """SLIC + per-superpixel features (`pipelines.py:244-269`).

    :returns: (labels (H, W) int32 ndarray, features (K, F) ndarray) where K
        is the static superpixel capacity; empty slots are zero rows.
    """
    if sp_regul <= 0:
        raise ValueError('slic. regularisation must be positive')
    image = jnp.asarray(image)
    cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    labels, features, _counts, _centers = _slic_features_core(
        image, cfg, _features_spec(dict_features), m)
    return np.asarray(labels), np.nan_to_num(np.asarray(features))


def pipe_color2d_slic_features_model_graphcut(
        image, nb_classes, dict_features, sp_size=30, sp_regul=0.2,
        pca_coef=None, use_scaler=True, estim_model='GMM', gc_regul=1.0,
        gc_edge_type='model', seed=0, debug_visual=None):
    """Unsupervised single-image pipeline (`pipelines.py:46-110`):
    SLIC -> features -> class model -> MRF regularisation.

    :returns: (segm (H, W) int ndarray, segm_soft (H, W, C) float ndarray)
    """
    image = jnp.asarray(image)
    cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    segm, segm_soft, labels, features, proba, _model, graph_labels = \
        _pipe_unsup_core(
            image, cfg=cfg, feats_spec=_features_spec(dict_features),
            nb_classes=nb_classes, estim_model=estim_model, pca_coef=pca_coef,
            use_scaler=use_scaler, gc_regul=float(gc_regul),
            gc_edge_type=gc_edge_type, compactness=m, seed=seed)
    if debug_visual is not None:
        debug_visual['slic'] = np.asarray(labels)
        debug_visual['features'] = np.asarray(features)
        debug_visual['proba'] = np.asarray(proba)
        debug_visual['model'] = _model
        return np.asarray(segm), np.asarray(segm_soft)
    return _fetch_reconstruct(labels, proba, graph_labels, cfg)


def estim_model_classes_group(list_images, nb_classes, dict_features,
                              sp_size=30, sp_regul=0.2, use_scaler=True,
                              pca_coef=None, model_type='GMM', seed=0):
    """Fit one class model over several images (`pipelines.py:113-157`).

    :returns: (ClassModel, list of per-image feature arrays)
    """
    feats_spec = _features_spec(dict_features)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    all_features, all_masks, list_features = [], [], []
    for image in list_images:
        image = jnp.asarray(image)
        cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
        _labels, features, counts, _centers = _slic_features_core(
            image, cfg, feats_spec, m)
        all_features.append(features)
        all_masks.append((counts > 0).astype(jnp.float32))
        list_features.append(np.nan_to_num(np.asarray(features)))
    features = jnp.concatenate(all_features, axis=0)
    mask = jnp.concatenate(all_masks, axis=0)
    model = estim_class_model(jnp.nan_to_num(features), nb_classes, model_type,
                              pca_coef, use_scaler, sample_weight=mask, seed=seed)
    return model, list_features


def _segment_compat_core(image, model, dict_features, sp_size, sp_regul,
                         gc_regul, gc_edge_type):
    """Reference-compat segmentation path: skimage-semantics SLIC (5x5
    window, f32, split-relabel-merge connectivity — dynamic K) feeding the
    generic (non-grid) feature and graph ops.

    Matches the reference's stage composition exactly
    (`/root/reference/imsegm/pipelines.py:160-241` over skimage SLIC,
    `superpixels.py:61-63`); used by ``sp_compat=True`` below and scored
    against the actual reference by `tools/refrun/compare.py`.
    """
    img_np = np.asarray(image)
    labels_np = slic_ops.segment_slic_img2d(
        img_np, sp_size=sp_size, relative_compact=sp_regul, compat=True)
    n_lb = int(labels_np.max()) + 1
    features, _names = descriptors.compute_selected_features_img2d(
        jnp.asarray(img_np, jnp.float32),
        jnp.asarray(labels_np.ravel(), jnp.int32), n_lb, dict_features)
    features = np.nan_to_num(np.asarray(features))
    proba = np.asarray(model.predict_proba(features), np.float32)
    graph_labels = np.asarray(graphcut.segment_graph_cut_general(
        jnp.asarray(labels_np, jnp.int32), jnp.asarray(proba), n_lb,
        image=jnp.asarray(img_np, jnp.float32),
        features=jnp.asarray(features, jnp.float32),
        gc_regul=float(gc_regul), edge_type=gc_edge_type))
    classes = np.asarray(getattr(model, 'classes_', None)
                         if getattr(model, 'classes_', None) is not None
                         else np.arange(proba.shape[1]))
    segm = classes[graph_labels][labels_np]
    return segm, proba[labels_np]


def segment_color2d_slic_features_model_graphcut(
        image, model_pipeline, dict_features, sp_size=30,
        sp_regul=0.2, gc_regul=1.0, gc_edge_type='model', debug_visual=None,
        sp_compat=False, connectivity=True):
    """Segment one image with a fitted model (`pipelines.py:160-241`).

    ``model_pipeline`` may be an unsupervised :class:`ClassModel` (fully
    on-device path) or any trained classifier exposing ``predict_proba`` and
    ``classes_`` (e.g. :class:`pyimsegm_tpu.classification.Classifier`); with
    a classifier the result is relabelled by ``classes_`` exactly as the
    reference does (`pipelines.py:224-240`).

    ``sp_compat=True`` routes superpixels through the skimage-faithful
    compat mode (see :func:`_segment_compat_core`) instead of the default
    grid-structured TPU formulation.

    :returns: (segm (H, W) ndarray, segm_soft (H, W, C) ndarray)
    """
    if sp_compat:
        return _segment_compat_core(image, model_pipeline, dict_features,
                                    sp_size, sp_regul, gc_regul, gc_edge_type)
    image = jnp.asarray(image)
    cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    if isinstance(model_pipeline, ClassModel):
        segm, segm_soft, labels, proba, graph_labels = \
            _segment_with_model_core(
                image, model_pipeline, cfg=cfg,
                feats_spec=_features_spec(dict_features),
                gc_regul=float(gc_regul), gc_edge_type=gc_edge_type,
                compactness=m, connectivity=connectivity)
        if debug_visual is not None:
            debug_visual['slic'] = np.asarray(labels)
            debug_visual['proba'] = np.asarray(proba)
        if not connectivity:
            # raw/absorbed labels may hold out-of-window pixels; the device
            # grid_lookup outputs are authoritative (see _fetch_reconstruct)
            return np.asarray(segm), np.asarray(segm_soft)
        return _fetch_reconstruct(labels, proba, graph_labels, cfg)

    if hasattr(model_pipeline, 'device_predict_fn'):
        # fitted Classifier: one jitted program for the whole predict path
        clf_apply, clf_arrays = model_pipeline.device_predict_fn()
        labels, proba, graph_labels = _segment_with_classif_core(
            image, clf_arrays, clf_apply=clf_apply, cfg=cfg,
            feats_spec=_features_spec(dict_features),
            gc_regul=float(gc_regul), gc_edge_type=gc_edge_type,
            compactness=m, connectivity=connectivity)
        classes = np.asarray(model_pipeline.classes_)
        if connectivity:
            segm_dense, segm_soft = _fetch_reconstruct(
                labels, proba, graph_labels, cfg)
        else:
            from pyimsegm_tpu.ops.grid import grid_lookup
            table = jnp.concatenate(
                [graph_labels[:, None].astype(jnp.float32), proba], axis=-1)
            up = grid_lookup(table, labels, cfg)
            segm_dense = np.asarray(up[..., 0]).astype(np.int64)
            segm_soft = np.asarray(up[..., 1:])
        if debug_visual is not None:
            debug_visual['slic'] = np.asarray(labels)
            debug_visual['proba'] = np.asarray(proba)
        return classes[segm_dense], segm_soft

    # generic duck-typed pipeline (e.g. an sklearn-style estimator): eager
    # composition with a host predict_proba round-trip
    labels, features, _counts, centers = _slic_features_core(
        image, cfg, _features_spec(dict_features), m)
    proba = np.asarray(model_pipeline.predict_proba(
        np.nan_to_num(np.asarray(features))), np.float32)
    graph_labels = np.asarray(graphcut.segment_graph_cut_general(
        labels, jnp.asarray(proba), cfg.n_segments,
        image=jnp.asarray(image, jnp.float32), features=features,
        gc_regul=float(gc_regul), edge_type=gc_edge_type,
        grid_ctx=(labels, cfg), centers=centers))
    labels_np = np.asarray(labels)
    classes = np.asarray(model_pipeline.classes_)
    segm = classes[graph_labels][labels_np]
    segm_soft = proba[labels_np]
    if debug_visual is not None:
        debug_visual['slic'] = labels_np
        debug_visual['proba'] = proba
    return segm, segm_soft


def train_classif_color2d_slic_features(list_images, list_annots, dict_features,
                                        sp_size=30, sp_regul=0.2,
                                        clf_name='RandForest', label_purity=0.9,
                                        feature_balance='unique', pca_coef=None,
                                        nb_classif_search=1,
                                        nb_hold_out=CROSS_VAL_LEAVE_OUT, seed=0):
    """Supervised training over annotated images (`pipelines.py:293-379`):
    superpixel labels from annotation-overlap purity, balanced dataset, then a
    classifier search.

    :returns: (classifier, list_slic, list_features, list_labels)
    """
    from pyimsegm_tpu import classification, labeling

    if len(list_images) != len(list_annots):
        raise ValueError('images (%i) vs annotations (%i) mismatch'
                         % (len(list_images), len(list_annots)))
    feats_spec = _features_spec(dict_features)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    list_slic, list_features, list_labels = [], [], []
    for image, annot in zip(list_images, list_annots):
        image = jnp.asarray(image)
        annot = np.asarray(annot).astype(int)
        if image.shape[:2] != annot.shape[:2]:
            raise ValueError('image %r and annot %r should match'
                             % (image.shape, annot.shape))
        cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
        labels_map, features, counts, _centers = _slic_features_core(
            image, cfg, feats_spec, m)
        neg_label = annot.max() + 1 if (annot < 0).any() else None
        if neg_label is not None:
            annot[annot < 0] = neg_label
        hist = labeling.histogram_regions_labels_norm(
            np.asarray(labels_map), annot, nb_labels=annot.max() + 1)
        k = np.asarray(counts).shape[0]
        if hist.shape[0] < k:
            # the highest grid label(s) can be empty (e.g. merged away by
            # the min-size connectivity pass); pad to the static capacity
            hist = np.vstack([hist,
                              np.zeros((k - hist.shape[0], hist.shape[1]))])
        lbs = np.argmax(hist, axis=1)
        purity = np.max(hist, axis=1)
        if neg_label is not None:
            lbs[lbs == neg_label] = -1
        lbs[purity < label_purity] = -1
        lbs[np.asarray(counts) == 0] = -1          # padded empty slots
        list_slic.append(np.asarray(labels_map))
        list_features.append(np.nan_to_num(np.asarray(features)))
        list_labels.append(lbs)

    features, labels, sizes = classification.convert_set_features_labels_2_dataset(
        dict(enumerate(list_features)), dict(enumerate(list_labels)),
        balance_type=feature_balance, drop_labels=[-1])
    features = np.nan_to_num(features)

    if len(sizes) > (nb_hold_out * 5):
        cv = classification.CrossValidateGroups(sizes, nb_hold_out=nb_hold_out)
    else:
        cv = 10
    classif, _ = classification.create_classif_search_train_export(
        clf_name, features, labels, pca_coef=pca_coef, cross_val=cv,
        nb_search_iter=nb_classif_search, seed=seed)
    return classif, list_slic, list_features, list_labels


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'feats_spec', 'nb_classes', 'estim_model',
                     'gc_regul', 'seed'))
def _pipe_gray3d_core(image, *, cfg, feats_spec, nb_classes, estim_model,
                      gc_regul, compactness, seed=0):
    """One XLA program for the whole 3D pipe: supervoxels -> scatter-free
    reductions -> model fit -> grid MRF -> lookup upsample (the eager stage
    composition paid a host sync per stage; the plain segment_sum/gather
    formulations cost ~800/195 ms each at 23.6 MVox, tools/profile_cfg6.py).
    """
    from pyimsegm_tpu.ops import slic3d

    k = cfg.n_segments
    labels = slic3d.slic3d_segment(image, cfg, compactness)
    seg_ids = labels.ravel()
    counts = slic3d.grid3d_segment_sum(
        jnp.ones(labels.shape + (1,), jnp.float32), labels, cfg)[:, 0]
    mask = (counts > 0).astype(jnp.float32)
    features, _names = descriptors.compute_selected_features_gray3d(
        image, seg_ids, k, dict(feats_spec), grid_ctx3d=(labels, cfg))
    # reference normalises features for the 3D pipe (`pipelines.py:420-422`)
    mu = jnp.sum(features * mask[:, None], 0) / jnp.maximum(jnp.sum(mask), 1.0)
    sd = jnp.sqrt(jnp.sum(((features - mu) ** 2) * mask[:, None], 0)
                  / jnp.maximum(jnp.sum(mask), 1.0))
    features = (features - mu) / jnp.maximum(sd, 1e-12)
    model = estim_class_model(features, nb_classes, estim_model,
                              sample_weight=mask, seed=seed)
    proba = model.predict_proba(features)
    graph_labels = graphcut.segment_graph_cut_general(
        labels, proba, k, image=image, features=features,
        gc_regul=float(gc_regul), edge_type='model',
        grid_ctx3d=(labels, cfg))
    return slic3d.grid3d_lookup(graph_labels.astype(jnp.int32), labels, cfg)


def pipe_gray3d_slic_features_model_graphcut(image, nb_classes, dict_features,
                                             spacing=(12, 1, 1), sp_size=15,
                                             sp_regul=0.2, gc_regul=0.1,
                                             estim_model='GMM', seed=0):
    """3D gray-volume pipeline (`pipelines.py:382-431`).

    :param image: (Z, H, W) gray volume
    :returns: segm (Z, H, W) int ndarray
    """
    from pyimsegm_tpu.ops import slic3d

    image = jnp.asarray(image, jnp.float32)
    cfg = slic3d.slic3d_config(image.shape, sp_size, spacing)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    segm = _pipe_gray3d_core(
        image, cfg=cfg, feats_spec=_features_spec(dict_features),
        nb_classes=nb_classes, estim_model=estim_model,
        gc_regul=float(gc_regul), compactness=m, seed=seed)
    return np.asarray(segm).astype(np.int64)


def wrapper_compute_color2d_slic_features_labels(img_annot, sp_size, sp_regul,
                                                 dict_features,
                                                 label_purity=0.9):
    """Per-image (slic, features, labels) for supervised training
    (`pipelines.py:272-290`): superpixel labels by annotation-overlap argmax,
    impure superpixels (purity < threshold) mapped to -1.

    :param img_annot: (image, annotation) pair
    :returns: (slic ndarray, features ndarray, labels ndarray)
    """
    from pyimsegm_tpu import labeling

    image, annot = img_annot
    image = jnp.asarray(image)
    annot = np.asarray(annot).astype(int)
    feats_spec = _features_spec(dict_features)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    cfg = slic_ops.slic_config(image.shape[0], image.shape[1], sp_size)
    labels_map, features, counts, _centers = _slic_features_core(
        image, cfg, feats_spec, m)
    neg_label = annot.max() + 1 if (annot < 0).any() else None
    if neg_label is not None:
        annot[annot < 0] = neg_label
    hist = labeling.histogram_regions_labels_norm(
        np.asarray(labels_map), annot, nb_labels=annot.max() + 1)
    lbs = np.argmax(hist, axis=1)
    purity = np.max(hist, axis=1)
    if neg_label is not None:
        lbs[lbs == neg_label] = -1
    lbs[purity < label_purity] = -1
    lbs[np.asarray(counts) == 0] = -1
    return (np.asarray(labels_map), np.nan_to_num(np.asarray(features)), lbs)
