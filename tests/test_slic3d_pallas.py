"""3D SLIC Pallas kernel vs the XLA formulation.

The kernel logic is validated on every platform through the Pallas
interpreter (exact agreement expected — both paths share formulas and
iteration order); Mosaic-compiled execution is covered on a live chip via
``PYIMSEGM_TEST_TPU=1`` + ``PYIMSEGM_SLIC3D_PALLAS=1``.

Each helper run clears the jit caches and counts ``pallas_call``
invocations, so a jit-cache hit on the XLA path can never masquerade as a
passing kernel-parity test (that is exactly how a broken kernel "passed"
in round 1).
"""

import os
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


def _labels_pallas(vol, cfg, m, interpret):
    """Run slic3d_segment on the Pallas backend, asserting it executed."""
    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops import slic3d_pallas as sp3
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    n_calls = [0]

    def counting_call(*a, **k):
        n_calls[0] += 1
        if interpret:
            k['interpret'] = True
        return orig_call(*a, **k)

    # fresh trace: a previous XLA- or Pallas-path compile of the same
    # shapes must not short-circuit this run
    jax.clear_caches()
    with mock.patch.dict(os.environ, {'PYIMSEGM_SLIC3D_PALLAS': '1'}), \
            mock.patch('pyimsegm_tpu.ops.slic._pallas_available',
                       lambda: True), \
            mock.patch.object(sp3.pl, 'pallas_call', counting_call):
        out = np.asarray(slic3d.slic3d_segment(vol, cfg, m))
    assert n_calls[0] > 0, 'Pallas path was never executed (vacuous test)'
    return out


@pytest.mark.parametrize('spacing', [(1, 1, 1), (2, 1, 1)])
def test_slic3d_pallas_interpret_matches_xla(spacing):
    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((12, 48, 64), dtype=np.float32))
    cfg = slic3d.slic3d_config(vol.shape, 8, spacing)
    m = compactness_from_regul(8, 0.2)
    lbx = np.asarray(slic3d.slic3d_segment(vol, cfg, m))
    lbp = _labels_pallas(vol, cfg, m, interpret=True)
    assert np.array_equal(lbp, lbx)


def _tpu_available():
    try:
        return any(d.platform == 'tpu' for d in jax.devices())
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_available(),
                    reason='compiled 3D kernel needs a TPU backend')
def test_slic3d_pallas_compiled_matches_xla():
    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.random((16, 96, 128), dtype=np.float32))
    cfg = slic3d.slic3d_config(vol.shape, 10, (2, 1, 1))
    m = compactness_from_regul(10, 0.2)
    lbx = np.asarray(slic3d.slic3d_segment(vol, cfg, m))
    lbp = _labels_pallas(vol, cfg, m, interpret=False)
    assert (lbp == lbx).mean() > 0.999
