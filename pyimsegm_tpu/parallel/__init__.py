"""Device-mesh parallelism: batched and sharded pipelines.

Replaces the reference's ``multiprocessing.Pool`` fan-out
(`/root/reference/imsegm/utilities/experiments.py:354-414`) with JAX SPMD:
``vmap`` batches images on one chip, ``shard_map`` over a ``jax.sharding.Mesh``
distributes batches across chips with XLA collectives (psum) for the shared
model statistics.
"""

from pyimsegm_tpu.parallel.batch import (  # noqa: F401
    make_mesh,
    segment_images_batch,
    distributed_gmm_em,
)
