"""Pallas grid kernels vs the portable XLA formulations.

These kernels only run on a real TPU backend; on the CPU test mesh the
dispatchers in `pyimsegm_tpu.ops.grid` use the one-hot einsum path, so this
module self-skips off-TPU (the driver's real-chip bench exercises them).
"""

import os

import numpy as np
import pytest

import jax


def _tpu_available():
    try:
        return any(d.platform == 'tpu' for d in jax.devices())
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(),
                                reason='pallas kernels need a TPU backend')


@pytest.fixture(scope='module')
def scene():
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    cfg = slic_ops.slic_config(200, 300, 25)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((200, 300, 3), np.float32))
    m = slic_ops.compactness_from_regul(25, 0.2)
    labels = jax.jit(lambda im: slic_ops.slic_segment(im, cfg, m))(img)
    return cfg, img, jax.block_until_ready(labels)


def _with_flag(value, fn):
    old = os.environ.get('PYIMSEGM_SLIC_PALLAS', 'auto')
    os.environ['PYIMSEGM_SLIC_PALLAS'] = value
    try:
        return fn()
    finally:
        os.environ['PYIMSEGM_SLIC_PALLAS'] = old


def test_grid_reduce_matches_xla(scene):
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import grid as grid_ops
    cfg, img, labels = scene
    data = jnp.concatenate([img, img * img,
                            jnp.ones(img.shape[:2] + (1,))], -1)
    ref = _with_flag('0', lambda: np.asarray(
        grid_ops.grid_segment_sum(data, labels, cfg)))
    new = _with_flag('1', lambda: np.asarray(
        grid_ops.grid_segment_sum(data, labels, cfg)))
    assert np.allclose(ref, new, rtol=1e-4, atol=1e-2)


def test_grid_lookup_matches_xla(scene):
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import grid as grid_ops
    cfg, _img, labels = scene
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.random((cfg.n_segments, 3), np.float32))
    ref = _with_flag('0', lambda: np.asarray(
        grid_ops.grid_lookup(table, labels, cfg)))
    new = _with_flag('1', lambda: np.asarray(
        grid_ops.grid_lookup(table, labels, cfg)))
    assert np.allclose(ref, new, atol=1e-6)


def test_grid_adjacency_matches_xla(scene):
    from pyimsegm_tpu.ops import grid as grid_ops
    cfg, _img, labels = scene
    ref = _with_flag('0', lambda: np.asarray(
        grid_ops.grid_adjacency(labels, cfg)))
    new = _with_flag('1', lambda: np.asarray(
        grid_ops.grid_adjacency(labels, cfg)))
    assert np.array_equal(ref, new)
