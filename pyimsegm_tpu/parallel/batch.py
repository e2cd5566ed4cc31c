"""Batched + multi-chip execution of the segmentation pipelines.

Data parallelism over images is the reference's only distribution axis
(`SURVEY.md` §2.5; `multiprocessing.Pool.imap``); here it is:

* single chip: ``jax.vmap`` of the jitted per-image pipeline;
* multi chip: ``jax.shard_map`` over a 1D ``Mesh(('batch',))`` — images are
  sharded over the batch axis, the per-image compute is embarrassingly
  parallel, and the only cross-chip traffic is ``psum`` of GMM sufficient
  statistics (group-model fitting) and metric reductions, riding ICI.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyimsegm_tpu import descriptors
from pyimsegm_tpu.models import gmm as gmm_mod
from pyimsegm_tpu.ops import graphcut
from pyimsegm_tpu.ops import slic as slic_ops


def make_mesh(n_devices=None, axis_name='batch'):
    """1D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _segment_one(image, model, *, cfg, feats_spec, gc_regul, gc_edge_type,
                 compactness):
    from pyimsegm_tpu.ops.grid import grid_lookup
    from pyimsegm_tpu.pipelines import _slic_features_core
    # fused path: geometry (and color moments when the feature spec allows)
    # fall out of the final SLIC kernel pass
    labels, features, _counts, centers = _slic_features_core(
        image, cfg, feats_spec, compactness)
    k = cfg.n_segments
    proba = model.predict_proba(features)
    graph_labels = graphcut.segment_graph_cut_general(
        labels, proba, k, image=jnp.asarray(image, jnp.float32),
        features=features, gc_regul=gc_regul, edge_type=gc_edge_type,
        grid_ctx=(labels, cfg), centers=centers)
    # one fused upsample for the hard labels + soft proba map
    table = jnp.concatenate(
        [graph_labels[:, None].astype(jnp.float32), proba], axis=-1)
    up = grid_lookup(table, labels, cfg)
    return up[..., 0].astype(jnp.int32), up[..., 1:]


@functools.partial(jax.jit,
                   static_argnames=('cfg', 'feats_spec', 'gc_regul',
                                    'gc_edge_type', 'compactness', 'mesh_axis'))
def _segment_batch_jit(images, model, *, cfg, feats_spec, gc_regul,
                       gc_edge_type, compactness, mesh_axis=None):
    fn = functools.partial(_segment_one, cfg=cfg, feats_spec=feats_spec,
                           gc_regul=gc_regul, gc_edge_type=gc_edge_type,
                           compactness=compactness)
    return jax.vmap(fn, in_axes=(0, None))(images, model)


def segment_images_batch(images, model, dict_features, sp_size=30,
                         sp_regul=0.2, gc_regul=1.0, gc_edge_type='model',
                         mesh=None):
    """Segment a stack of same-shape images with a fitted model.

    :param images: (B, H, W, 3) array
    :param mesh: optional Mesh; images are sharded over its 'batch' axis
    :returns: (segms (B, H, W), probs (B, H, W, C)) numpy arrays
    """
    images = jnp.asarray(images, jnp.float32)
    b, h, w = images.shape[:3]
    cfg = slic_ops.slic_config(h, w, sp_size)
    m = slic_ops.compactness_from_regul(sp_size, sp_regul)
    spec = tuple((k, tuple(v)) for k, v in dict_features.items())
    if mesh is not None:
        images = jax.device_put(images, NamedSharding(mesh, P('batch')))
        model = jax.device_put(model, NamedSharding(mesh, P()))
    segms, probs = _segment_batch_jit(
        images, model, cfg=cfg, feats_spec=spec, gc_regul=float(gc_regul),
        gc_edge_type=gc_edge_type, compactness=m)
    return np.asarray(segms), np.asarray(probs)


# ------------------------------------------------------- distributed EM ----

def distributed_gmm_em(features, sample_weight, n_components, mesh,
                       n_iter=30, reg_covar=1e-6, seed=0):
    """Fit one GMM over features sharded across a device mesh.

    The multi-chip group-model 'training step' of the framework: features of
    shape (B, K, D) are sharded over the mesh 'batch' axis; each EM iteration
    computes local responsibilities and reduces the sufficient statistics
    with ``psum`` over ICI — the SPMD replacement for the reference's
    "concatenate features from all images then fit on one host"
    (`/root/reference/imsegm/pipelines.py:139-157`).

    :param features: (B, K, D) per-image padded feature stacks
    :param sample_weight: (B, K) weights (0 for padded slots)
    :returns: GMMParams (replicated)
    """
    features = jnp.asarray(features, jnp.float32)
    sample_weight = jnp.asarray(sample_weight, jnp.float32)
    b, k, d = features.shape
    c = n_components

    # init from a weighted subsample on host (cheap, one time)
    flat = np.asarray(features).reshape(-1, d)
    wflat = np.asarray(sample_weight).reshape(-1)
    sel = np.nonzero(wflat > 0)[0]
    rng = np.random.default_rng(seed)
    pick = rng.choice(sel, size=c, replace=len(sel) < c)
    means0 = jnp.asarray(flat[pick])
    cov0 = jnp.eye(d) * (np.var(flat[sel], axis=0).mean() + reg_covar)
    params0 = gmm_mod.GMMParams(jnp.full((c,), 1.0 / c),
                                means0, jnp.tile(cov0[None], (c, 1, 1)))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P('batch'), P('batch')),
        out_specs=P(),
        check_vma=False)
    def em_step(params, x_shard, w_shard):
        x = x_shard.reshape(-1, d)
        w = w_shard.reshape(-1)
        resp = gmm_mod.gmm_predict_proba(params, x) * w[:, None]
        nk = jax.lax.psum(jnp.sum(resp, axis=0), 'batch')        # (C,)
        sx = jax.lax.psum(resp.T @ x, 'batch')                   # (C, D)
        nk_safe = jnp.maximum(nk, 1e-10)
        means = sx / nk_safe[:, None]
        # second round with *centered* moments — the one-pass E[xx]-mm form
        # cancels catastrophically for low-mass components and goes non-PSD
        xc = x[:, None, :] - means[None]                         # (N, C, D)
        sxx = jnp.einsum('nc,ncd,nce->cde', resp, xc, xc)
        covs = jax.lax.psum(sxx, 'batch') / nk_safe[:, None, None]
        covs = covs + reg_covar * jnp.eye(d)
        weights = nk / jnp.sum(nk)
        # dead components keep their previous parameters instead of
        # collapsing to a singular covariance
        dead = nk < 1e-3
        means = jnp.where(dead[:, None], params.means, means)
        covs = jnp.where(dead[:, None, None], params.covs, covs)
        weights = jnp.maximum(weights, 1e-8)
        weights = weights / jnp.sum(weights)
        return gmm_mod.GMMParams(weights, means, covs)

    params = params0
    with mesh:
        for _ in range(n_iter):
            params = em_step(params, features, sample_weight)
    return params
