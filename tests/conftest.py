"""Test config: force an 8-device virtual CPU mesh before jax initialises.

Multi-chip sharding is validated on virtual host devices (no TPU pod needed);
the driver's ``dryrun_multichip`` does the same.
"""

import os

# force CPU by default: the host environment may preset JAX_PLATFORMS to a
# real accelerator (e.g. the axon TPU tunnel), and tests must never share the
# single TPU with benchmarks.  Set PYIMSEGM_TEST_TPU=1 to keep the real
# backend and exercise the TPU-gated kernel-parity tests.
_use_tpu = os.environ.get('PYIMSEGM_TEST_TPU', '') == '1'
if not _use_tpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    _flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in _flags:
        os.environ['XLA_FLAGS'] = (
            _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# the axon sitecustomize registers the TPU platform via jax.config, which
# overrides the env var — force CPU explicitly before any backend init
if not _use_tpu:
    jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)
