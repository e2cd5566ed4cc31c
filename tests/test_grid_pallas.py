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


def test_grid_geometry_moments_matches_xla(scene):
    """The fused moments kernel (channels synthesized in VMEM) must match
    the portable stacked-channel segment sum it replaces on the
    post-enforcement re-reduce path (`pipelines._slic_features_core`)."""
    from pyimsegm_tpu.ops import grid as grid_ops
    cfg, img, labels = scene
    ref = _with_flag('0', lambda: np.asarray(
        grid_ops.grid_geometry_moments(img, labels, cfg)))
    new = _with_flag('1', lambda: np.asarray(
        grid_ops.grid_geometry_moments(img, labels, cfg)))
    assert ref.shape == new.shape == (cfg.n_segments, 9)
    assert np.allclose(ref, new, rtol=1e-4, atol=1e-2)


def test_grid_adjacency_matches_xla(scene):
    from pyimsegm_tpu.ops import grid as grid_ops
    cfg, _img, labels = scene
    ref = _with_flag('0', lambda: np.asarray(
        grid_ops.grid_adjacency(labels, cfg)))
    new = _with_flag('1', lambda: np.asarray(
        grid_ops.grid_adjacency(labels, cfg)))
    assert np.array_equal(ref, new)


def test_slic_assign_pallas_matches_bruteforce():
    """Single assign pass vs an f64 numpy argmin over the 9 candidates.

    Guards the dot-product score form in `slic_pallas` (incl. the matmul
    precision: default TPU matmul precision rounds the |c|^2/2 row enough
    to flip whole superpixels — see the kernel docstring)."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops import slic_pallas as sp

    cfg = slic_ops.slic_config(200, 300, 25)
    gh, gw, step = cfg.grid_h, cfg.grid_w, cfg.step
    rng = np.random.default_rng(3)
    lab = rng.random((3, cfg.pad_h, cfg.pad_w)).astype(np.float32) * 100
    centers = np.zeros((gh, gw, 5), np.float32)
    centers[..., :3] = rng.random((gh, gw, 3)) * 100
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing='ij')
    centers[..., 3] = (yy + 0.5) * step - 0.5
    centers[..., 4] = (xx + 0.5) * step - 0.5
    sw = 0.28

    out = np.asarray(sp.slic_assign_pallas(
        jnp.asarray(lab, jnp.bfloat16), jnp.asarray(centers),
        jnp.float32(sw), cfg))

    labf = np.asarray(jnp.asarray(lab, jnp.bfloat16).astype(jnp.float32))
    Y, X = np.mgrid[0:cfg.pad_h, 0:cfg.pad_w].astype(np.float64)
    ti, tj = (Y // step).astype(int), (X // step).astype(int)
    best = np.full(Y.shape, 1e30)
    bo = np.zeros(Y.shape, np.int64)
    for di, dj in sp._OFFSETS:
        ci, cj = ti + di, tj + dj
        ok = (ci >= 0) & (ci < gh) & (cj >= 0) & (cj < gw)
        cis, cjs = np.clip(ci, 0, gh - 1), np.clip(cj, 0, gw - 1)
        c = centers[cis, cjs].astype(np.float64)
        d = ((labf[0] - c[..., 0]) ** 2 + (labf[1] - c[..., 1]) ** 2
             + (labf[2] - c[..., 2]) ** 2
             + sw * ((Y - c[..., 3]) ** 2 + (X - c[..., 4]) ** 2))
        d = np.where(ok, d, 1e30)
        take = d < best
        best = np.where(take, d, best)
        bo = np.where(take, cis * gw + cjs, bo)
    # disagreements must be limited to fp near-ties (random data is the
    # worst case; the old bf16-matmul bug sat at ~80% here)
    assert (out == bo).mean() > 0.985


def test_slic_pallas_matches_xla_end_to_end():
    """Full 10-iteration SLIC: pallas vs the portable XLA path on a real
    sample image (label agreement ~99.9% after the precision fix)."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.slic import _slic_segment_pallas, _slic_segment_xla
    from pyimsegm_tpu.utils import data_samples

    img = np.asarray(data_samples.load_sample_image(), np.float32)
    img = img[:300, :400]
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 35)
    m = slic_ops.compactness_from_regul(35, 0.2)
    la = np.asarray(_slic_segment_pallas(jnp.asarray(img), cfg, m))
    lb = np.asarray(_slic_segment_xla(jnp.asarray(img), cfg, m))
    assert (la == lb).mean() > 0.99


def test_slic_with_geometry_consistent():
    """Fused labels+geometry pass: labels identical to the plain segment
    path, counts/centres identical to the standalone geometry reduce."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.utils import data_samples

    img = np.asarray(data_samples.load_sample_image(), np.float32)[:300, :400]
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 25)
    m = slic_ops.compactness_from_regul(25, 0.2)
    labels, counts, centers = slic_ops.slic_segment_with_geometry(
        jnp.asarray(img), cfg, m)
    labels2 = slic_ops.slic_segment(jnp.asarray(img), cfg, m)
    assert np.array_equal(np.asarray(labels), np.asarray(labels2))
    counts2, centers2 = slic_ops._labels_geometry(labels2, cfg)
    assert np.array_equal(np.asarray(counts), np.asarray(counts2))
    occupied = np.asarray(counts) > 0
    assert np.allclose(np.asarray(centers)[occupied],
                       np.asarray(centers2)[occupied], atol=1e-3)


def test_slic_slico_pallas_matches_xla_on_tpu():
    """SLICO through the fused kernels on the real chip vs the portable XLA
    path (the interpret-mode twin lives in test_slic_multi_pallas.py); also
    compile-checks the 8-row candidate layout + in-kernel segmented max
    under Mosaic."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.ops.slic import _slic_segment_pallas, _slic_segment_xla
    from pyimsegm_tpu.utils import data_samples

    img = np.asarray(data_samples.load_sample_image(), np.float32)[:300, :400]
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 25)
    m = slic_ops.compactness_from_regul(25, 0.2)
    la = np.asarray(_slic_segment_pallas(jnp.asarray(img), cfg, m,
                                         slico=True))
    lb = np.asarray(_slic_segment_xla(jnp.asarray(img), cfg, m, slico=True))
    assert (la == lb).mean() > 0.99


def test_moments_apply_matches_separate_passes(scene):
    """Fused donor-apply + moments kernel vs the separate grid_lookup apply
    followed by grid_geometry_moments (min-size merge semantics)."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import grid as grid_ops
    from pyimsegm_tpu.ops.grid_pallas import grid_moments_apply_pallas

    cfg, img, labels = scene
    labels = grid_ops.enforce_grid_connectivity(labels, cfg)
    min_size = int(0.5 * cfg.step * cfg.step)
    counts, sym25, counts9 = grid_ops.counts_and_contacts(labels, cfg)
    donor = grid_ops.donor_chain_table(counts, sym25, cfg.grid_h, cfg.grid_w,
                                       min_size, counts9=counts9)

    merged_ref = grid_ops.min_size_merge(labels, cfg, min_size)
    sums_ref = np.asarray(grid_ops.grid_geometry_moments(img, merged_ref,
                                                         cfg))
    merged, sums = grid_moments_apply_pallas(jnp.asarray(img, jnp.float32),
                                             labels, donor, cfg)
    assert np.array_equal(np.asarray(merged), np.asarray(merged_ref))
    assert np.allclose(np.asarray(sums), sums_ref, rtol=1e-4, atol=1e-2)


def test_enforce_minsize_with_moments_matches_composition(scene):
    """The orchestration helper must equal enforce(min_size) + moments."""
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import grid as grid_ops
    from pyimsegm_tpu.ops import slic as slic_ops

    cfg, img, _ = scene
    m = slic_ops.compactness_from_regul(25, 0.2)
    raw = slic_ops.slic_segment(img, cfg, m)
    min_size = int(0.5 * cfg.step * cfg.step)
    lab_ref = grid_ops.enforce_grid_connectivity(raw, cfg, min_size=min_size)
    sums_ref = np.asarray(grid_ops.grid_geometry_moments(
        jnp.asarray(img, jnp.float32), lab_ref, cfg))
    lab, sums = grid_ops.enforce_minsize_with_moments(
        raw, cfg, min_size, None, jnp.asarray(img, jnp.float32))
    assert np.array_equal(np.asarray(lab), np.asarray(lab_ref))
    assert np.allclose(np.asarray(sums), sums_ref, rtol=1e-4, atol=1e-2)
