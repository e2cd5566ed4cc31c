"""Per-stage timing for the segmentation pipeline.

The reference has no profiling beyond tqdm bars and wall-clock totals
(`/root/reference/imsegm/utilities/experiments.py:387-411`,
`run_center_prediction.py:75-80`); with a MPix/s/chip north star this
framework needs real stage attribution.  XLA fuses whole pipelines into one
program, so stages cannot be timed inside a single jit — instead each stage
boundary is measured as the steady-state wall time of a progressively larger
jitted prefix of the pipeline (prefix deltas = stage costs).  Deltas can be
slightly negative when XLA overlaps a stage with its neighbours; that is
signal, not noise.
"""

import time

import jax


def time_jitted(fn, *args, reps=5, warmup=1):
    """Steady-state seconds per call of ``fn(*args)`` (blocking)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def profile_prefixes(prefixes, *args, reps=5):
    """Time a list of (name, jitted_fn) pipeline prefixes on shared args.

    :returns: list of (name, total_s, delta_s) — delta vs previous prefix
    """
    rows, prev = [], 0.0
    for name, fn in prefixes:
        t = time_jitted(fn, *args, reps=reps)
        rows.append((name, t, t - prev))
        prev = t
    return rows


def pipeline_stage_profile(images, model, cfg, feats_spec, compactness,
                           gc_regul=2.0, gc_edge_type='model', reps=5):
    """Stage profile of the batched unsupervised pipeline.

    :param images: (B, H, W, 3) device array
    :returns: list of (stage, total_s, delta_s)
    """
    import functools

    import jax.numpy as jnp

    from pyimsegm_tpu import descriptors
    from pyimsegm_tpu.ops import graphcut
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.parallel.batch import _segment_one

    spec = dict(feats_spec)

    def slic_only(ims):
        return jax.vmap(
            lambda im: slic_ops.slic_segment(im, cfg, compactness))(ims)

    def with_features(ims):
        def f(im):
            lb = slic_ops.slic_segment(im, cfg, compactness)
            fts, _ = descriptors.compute_selected_features_color2d(
                im, lb.ravel(), cfg.n_segments, spec, grid_ctx=(lb, cfg))
            return fts
        return jax.vmap(f)(ims)

    def with_proba(ims):
        def f(im):
            lb = slic_ops.slic_segment(im, cfg, compactness)
            fts, _ = descriptors.compute_selected_features_color2d(
                im, lb.ravel(), cfg.n_segments, spec, grid_ctx=(lb, cfg))
            return model.predict_proba(fts)
        return jax.vmap(f)(ims)

    def with_mrf(ims):
        def f(im):
            lb, _c, centers = slic_ops.slic_segment_with_geometry(
                im, cfg, compactness)
            fts, _ = descriptors.compute_selected_features_color2d(
                im, lb.ravel(), cfg.n_segments, spec, grid_ctx=(lb, cfg))
            proba = model.predict_proba(fts)
            return graphcut.segment_graph_cut_general(
                lb, proba, cfg.n_segments, image=im, features=fts,
                gc_regul=gc_regul, edge_type=gc_edge_type,
                grid_ctx=(lb, cfg), centers=centers)
        return jax.vmap(f)(ims)

    def full(ims):
        fn = functools.partial(
            _segment_one, cfg=cfg, feats_spec=tuple(feats_spec),
            gc_regul=gc_regul, gc_edge_type=gc_edge_type,
            compactness=compactness)
        return jax.vmap(lambda im: fn(im, model))(ims)

    images = jnp.asarray(images)
    return profile_prefixes(
        [('slic', jax.jit(slic_only)),
         ('features', jax.jit(with_features)),
         ('model_proba', jax.jit(with_proba)),
         ('mrf', jax.jit(with_mrf)),
         ('upsample(full)', jax.jit(full))],
        images, reps=reps)
