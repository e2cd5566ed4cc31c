"""Data-parallel batching over the virtual 8-device mesh.

Exercises the shard_map paths directly (the driver's ``dryrun_multichip``
covers them end-to-end; these pin the numerics): distributed GMM-EM must
recover the mixture a pooled single-device fit recovers, and the sharded
batch segmentation must agree with the unsharded one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pyimsegm_tpu.parallel import batch as pbatch

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs the 8-device virtual CPU mesh')
    return Mesh(np.array(devs[:8]), ('batch',))


def test_distributed_gmm_matches_pooled(mesh):
    rng = np.random.default_rng(0)
    d, k, b = 3, 64, 8
    true_means = np.array([[0., 0, 0], [6, 6, 6], [-6, 6, 0]])
    feats = np.zeros((b, k, d), np.float32)
    for i in range(b):
        comp = rng.integers(0, 3, k)
        feats[i] = true_means[comp] + rng.normal(0, 0.7, (k, d))
    weights = np.ones((b, k), np.float32)

    params = pbatch.distributed_gmm_em(feats, weights, 3, mesh, n_iter=40,
                                       seed=1)
    got = np.sort(np.asarray(params.means), axis=0)
    want = np.sort(true_means, axis=0)
    assert np.allclose(got, want, atol=0.35), (got, want)
    assert np.allclose(np.asarray(params.weights).sum(), 1.0, atol=1e-5)
    # mixture weights near uniform (components were drawn uniformly)
    assert np.all(np.asarray(params.weights) > 0.15)


def test_segment_images_batch_sharded_matches_unsharded(mesh):
    from pyimsegm_tpu.models.class_model import estim_class_model
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu import descriptors

    rng = np.random.default_rng(2)
    b, h, w = 8, 64, 96
    imgs = (rng.random((b, h, w, 3)) / 2).astype(np.float32)
    imgs[:, :, :48] += 0.5

    cfg = slic_ops.slic_config(h, w, 16)
    m = slic_ops.compactness_from_regul(16, 0.2)
    lb = slic_ops.slic_segment(jnp.asarray(imgs[0]), cfg, m)
    fts, _ = descriptors.compute_selected_features_color2d(
        jnp.asarray(imgs[0]), lb.ravel(), cfg.n_segments,
        {'color': ('mean', 'std')})
    model = estim_class_model(jnp.nan_to_num(fts), 2, 'GMM')

    segs_plain, probs_plain = pbatch.segment_images_batch(
        imgs, model, {'color': ('mean', 'std')}, sp_size=16, sp_regul=0.2,
        gc_regul=1.0)
    segs_mesh, probs_mesh = pbatch.segment_images_batch(
        imgs, model, {'color': ('mean', 'std')}, sp_size=16, sp_regul=0.2,
        gc_regul=1.0, mesh=mesh)
    assert segs_mesh.shape == (b, h, w)
    agree = (segs_plain == segs_mesh).mean()
    assert agree > 0.999, agree
    assert np.allclose(probs_plain, probs_mesh, atol=1e-4)
