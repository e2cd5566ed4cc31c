"""Fused multi-iteration SLIC update kernel vs the portable XLA path.

Interpret-mode (runs on the CPU mesh).  The kernel shares the dot-form
scoring with the per-pass kernel, but performs all update iterations in one
``pallas_call`` with the center table held in VMEM; agreement with the XLA
formulation is exact on this scene (both assign from the same bf16 pixels).

The patched run clears jit caches and counts ``pallas_call`` invocations so
the test cannot silently fall back to the XLA path (the round-1 3D parity
tests were vacuous exactly that way — see ADVICE.md r1).
"""

from unittest import mock

import numpy as np
import pytest


@pytest.mark.slow
def test_slic_multi_update_matches_xla_end_to_end():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.slic import _slic_segment_pallas, _slic_segment_xla
    import pyimsegm_tpu.ops.slic_pallas as sp
    from pyimsegm_tpu.utils import data_samples

    img = np.asarray(data_samples.load_sample_image(), np.float32)[:200, :300]
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 25)
    m = slic_ops.compactness_from_regul(25, 0.2)

    lb = np.asarray(_slic_segment_xla(jnp.asarray(img), cfg, m))

    orig_call = pl.pallas_call
    calls = []

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        calls.append(1)
        return orig_call(*args, **kwargs)

    with mock.patch.object(sp.pl, 'pallas_call', interp_call):
        jax.clear_caches()
        la = np.asarray(_slic_segment_pallas(jnp.asarray(img), cfg, m))

    assert len(calls) >= 2  # multi-update kernel + final assign actually ran
    assert (la == lb).mean() > 0.995


@pytest.mark.slow
def test_slic_slico_pallas_matches_xla():
    """SLICO (adaptive per-cluster compactness) through the fused kernels
    vs the XLA formulation (`_slic_segment_xla(slico=True)`).

    The kernel recovers the winner's color distance from the dot-form score
    (one divide per candidate) and max-pools it per cluster with a lane
    butterfly, so the per-cluster normaliser M drifts by float rounding vs
    the XLA twin's difference-form — near-total but not bit-exact label
    agreement.  Reference surface: ``skimage.segmentation.slic(slic_zero=
    True)`` via `/root/reference/imsegm/superpixels.py:61`."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.slic import _slic_segment_pallas, _slic_segment_xla
    import pyimsegm_tpu.ops.slic_pallas as sp
    from pyimsegm_tpu.utils import data_samples

    img = np.asarray(data_samples.load_sample_image(), np.float32)[:160, :200]
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 20)
    m = slic_ops.compactness_from_regul(20, 0.2)

    lb = np.asarray(_slic_segment_xla(jnp.asarray(img), cfg, m, slico=True))

    orig_call = pl.pallas_call
    calls = []

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        calls.append(1)
        return orig_call(*args, **kwargs)

    with mock.patch.object(sp.pl, 'pallas_call', interp_call):
        jax.clear_caches()
        la = np.asarray(_slic_segment_pallas(jnp.asarray(img), cfg, m,
                                             slico=True))

    assert len(calls) >= 2
    assert (la == lb).mean() > 0.99
    # SLICO must differ from plain SLIC (the adaptive normaliser is live)
    plain = np.asarray(_slic_segment_xla(jnp.asarray(img), cfg, m))
    assert (lb != plain).any()
