"""Sharded SLIC over the virtual 8-device mesh vs the single-device result."""

import jax
import numpy as np
import pytest

from pyimsegm_tpu.ops import slic as slic_ops
from pyimsegm_tpu.parallel.tiled import slic_segment_sharded
from pyimsegm_tpu.utils.metrics import adjusted_rand_score


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_slic_matches_single_device(rng):
    # grid must split evenly over 8 devices: sp_size 16 on 256 rows -> gh=16
    h, w, sp_size = 256, 192, 16
    image = rng.random((h, w, 3), dtype=np.float32)
    # smooth blobs so superpixels are meaningful
    from pyimsegm_tpu.ops.slic import gaussian_blur
    import jax.numpy as jnp
    image = np.asarray(gaussian_blur(jnp.asarray(image), 6.0))

    labels_sharded = slic_segment_sharded(image, sp_size, 0.2, n_iter=10)
    cfg = slic_ops.slic_config(h, w, sp_size)
    m = slic_ops.compactness_from_regul(sp_size, 0.2)
    labels_single = np.asarray(slic_ops._slic_segment_xla(
        jnp.asarray(image), cfg, m, n_iter=10))

    assert labels_sharded.shape == (h, w)
    agree = np.mean(labels_sharded == labels_single)
    ars = adjusted_rand_score(labels_sharded.ravel(), labels_single.ravel())
    # identical math up to psum reduction order -> near-perfect agreement
    assert agree > 0.995, (agree, float(ars))
    assert float(ars) > 0.99
