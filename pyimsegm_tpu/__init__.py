"""pyimsegm-tpu: a TPU-native superpixel segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of pyImSegm
(reference: /root/reference, Borda/pyImSegm): superpixel segmentation with
GraphCut-style regularisation, object centre detection with ray features and
ellipse fitting, and region growing with learned shape priors — engineered for
TPU hardware:

* SLIC superpixels as an iterative cluster assign/update schedule compiled by
  XLA (with a fused Pallas kernel for the assignment step).
* Per-superpixel features as segment-sum reductions over a statically padded
  label space; texture via one batched convolution of the Leung-Malik bank.
* Unsupervised class models (GMM-EM, k-means, Otsu) batched on device with
  vmapped restarts.
* An on-device MRF energy minimizer (mean-field + ICM sweeps, exact-argmax
  shortcut) replacing host C++ alpha-expansion, with a native C++ maxflow
  oracle for validation.
* Batching over images via `jax.vmap` / `shard_map` over a device mesh instead
  of multiprocessing pools.

Method families mirrored from the reference (see `/root/reference/imsegm/__init__.py:33-64`):
  1. superpixel segmentation with GraphCut regularisation,
  2. object centre detection + ellipse approximation,
  3. region growing with learned shape priors (RG2Sp).
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env():
    """Respect an explicitly-set ``JAX_PLATFORMS`` env var.

    Some host environments register their accelerator platform through
    ``jax.config`` in sitecustomize, which silently overrides the documented
    env var; re-apply it (before any backend init) so
    ``JAX_PLATFORMS=cpu python <any entry point>`` behaves as JAX documents.
    No-op when the variable is unset or the backend is already initialised."""
    import os
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        try:
            import jax
            jax.config.update('jax_platforms', plat)
        except Exception:
            pass


_honor_jax_platforms_env()

from pyimsegm_tpu import pipelines  # noqa: F401,E402
