"""skimage-compat SLIC mode (`segment_slic_img2d(..., compat=True)`).

The reference always runs skimage SLIC with ``enforce_connectivity=True``
(`/root/reference/imsegm/superpixels.py:61-63`).  The compat mode matches
those semantics — 5x5 search window, f32 pixels, skimage seed geometry,
split-relabel-merge connectivity with dynamic K — and is scored e2e against
the actual reference by `tools/refrun/compare.py --configs compat`
(round-4 result: shared-model ARS 0.9998 / 0.9834 / 1.0000 on
drosophila / CIMA / langerhans).
"""

import contextlib
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
_OVARY = os.path.join(DATA, 'drosophila_ovary_slice', 'image',
                      'insitu7545.jpg')


@contextlib.contextmanager
def _shim_segmentation():
    """Import the refrun skimage shim without leaving it in sys.modules
    (a fake 'skimage' must not leak into other tests)."""
    shims = os.path.join(REPO, 'tools', 'refrun', 'shims')
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == 'skimage' or k.startswith('skimage.')}
    sys.path.insert(0, shims)
    try:
        from skimage import segmentation
        yield segmentation
    finally:
        sys.path.remove(shims)
        for k in list(sys.modules):
            if k == 'skimage' or k.startswith('skimage.'):
                del sys.modules[k]
        sys.modules.update(saved)


def _two_region_labels(seed=0, h=96, w=128):
    """Raw SLIC-ish labels with injected fragments for connectivity tests."""
    rng = np.random.RandomState(seed)
    ty = np.arange(h)[:, None] // 16
    tx = np.arange(w)[None, :] // 16
    labels = (ty * 8 + tx).astype(np.int32)
    # sprinkle detached fragments of various sizes
    for _ in range(40):
        y, x = rng.randint(0, h - 4), rng.randint(0, w - 4)
        labels[y:y + rng.randint(1, 4), x:x + rng.randint(1, 4)] = \
            rng.randint(0, labels.max() + 1)
    return labels


def test_connectivity_postprocess_matches_shim():
    """native.enforce_connectivity (C++ and the numpy twin) must reproduce
    the shim's split-relabel-merge on identical raw labels."""
    from pyimsegm_tpu import native

    labels = _two_region_labels()
    with _shim_segmentation() as shim_seg:
        want = shim_seg._enforce_connectivity(labels, 16, 0.5, 0)
    got_native = native.enforce_connectivity(labels, min_size=int(0.5 * 256))
    got_numpy = native._enforce_connectivity_numpy(labels, int(0.5 * 256))
    assert (got_native == got_numpy).all(), 'C++ kernel != numpy twin'
    from sklearn.metrics import adjusted_rand_score as ars
    score = ars(want.ravel(), got_native.ravel())
    # exact up to merge tie-breaks keyed by the shim's per-label component
    # enumeration order (ours is raster order) — ties are rare
    assert score > 0.995, score


def test_compat_output_contract():
    """compat labels: sequential ids 0..K-1, each one 4-connected region."""
    from scipy import ndimage

    from pyimsegm_tpu.ops.slic import segment_slic_img2d

    rng = np.random.RandomState(3)
    img = (rng.rand(96, 128, 3) * 60).astype(np.float32)
    img[:, 64:] += 120.0
    labels = segment_slic_img2d(img, sp_size=16, relative_compact=0.2,
                                compat=True)
    uniq = np.unique(labels)
    assert uniq[0] == 0 and uniq[-1] == len(uniq) - 1, 'not sequential'
    st = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for k in uniq:
        assert ndimage.label(labels == k, structure=st)[1] == 1, \
            f'label {k} disconnected'


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isfile(_OVARY), reason='reference data')
def test_compat_matches_shim_on_real_image():
    """Tessellation-level agreement with the shim on a real image crop:
    identical seeding/window/connectivity semantics leave only fp-order
    drift in the chaotic k-means iterations."""
    from PIL import Image
    from sklearn.metrics import adjusted_rand_score as ars

    from pyimsegm_tpu.ops.slic import segment_slic_img2d

    img = np.asarray(Image.open(_OVARY))[:320, :256]
    sp, reg = 35, 0.2
    ours = segment_slic_img2d(img, sp_size=sp, relative_compact=reg,
                              compat=True)
    im01 = (img - img.min()) / float(img.max() - img.min())
    with _shim_segmentation() as shim_seg:
        want = shim_seg.slic(
            im01, n_segments=int(img.shape[0] * img.shape[1] / sp ** 2),
            compactness=(sp * reg) ** 1.5, sigma=1,
            enforce_connectivity=True, start_label=0)
    score = ars(want.ravel(), ours.ravel())
    assert score > 0.95, score


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isfile(_OVARY), reason='reference data')
def test_pipeline_sp_compat_path():
    """segment_color2d_slic_features_model_graphcut(sp_compat=True) runs the
    dynamic-K generic path end-to-end and stays close to the default path."""
    import jax.numpy as jnp
    from PIL import Image
    from sklearn.metrics import adjusted_rand_score as ars

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.models.class_model import estim_class_model

    img = np.asarray(Image.open(_OVARY))[:320, :256]
    feats = {'color': ['mean', 'std', 'energy']}
    # fit one shared model via the default path's features
    _labels, features, counts, _c = pipelines._slic_features_core(
        jnp.asarray(img), pipelines.slic_ops.slic_config(320, 256, 35),
        pipelines._features_spec(feats),
        pipelines.slic_ops.compactness_from_regul(35, 0.2))
    model = estim_class_model(jnp.nan_to_num(features), 3, 'GMM',
                              sample_weight=(counts > 0).astype(jnp.float32))
    seg_default, _ = pipelines.segment_color2d_slic_features_model_graphcut(
        img, model, feats, sp_size=35, sp_regul=0.2, gc_regul=2.0)
    seg_compat, soft = pipelines.segment_color2d_slic_features_model_graphcut(
        img, model, feats, sp_size=35, sp_regul=0.2, gc_regul=2.0,
        sp_compat=True)
    assert seg_compat.shape == img.shape[:2]
    assert soft.shape == img.shape[:2] + (3,)
    score = ars(np.asarray(seg_default).ravel(), np.asarray(seg_compat).ravel())
    assert score > 0.8, score
