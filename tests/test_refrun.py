"""tools/refrun harness: the reference must run through the shims and the
shared-model replay must agree (small synthetic image; marked slow)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get('PYIMSEGM_REFERENCE_PATH', '/root/reference')

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, 'imsegm')),
                       reason='reference checkout not available'),
]


def _run_in_refrun_env(code):
    """Execute ``code`` in a subprocess wired like run_reference.py."""
    prelude = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ.setdefault('MPLBACKEND', 'Agg')\n"
        "sys.path.insert(0, %r)\n"
        "sys.path.insert(0, %r)\n"
        "sys.path.insert(0, %r)\n"
        "import refcompat; refcompat.install()\n"
        % (os.path.join(REPO, 'tools', 'refrun', 'shims'), REFERENCE, REPO))
    out = subprocess.run([sys.executable, '-c', prelude + code],
                         capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_reference_runs_and_shared_model_replays(tmp_path):
    """Reference unsup pipeline on a synthetic two-region image through the
    shims; its fitted GMM replayed through the TPU pipeline must reproduce
    its labels (same spec, trivially separable image)."""
    path = tmp_path / 'ref.npz'
    stdout = _run_in_refrun_env(
        "import numpy as np\n"
        "from imsegm.pipelines import compute_color2d_superpixels_features\n"
        "from imsegm.graph_cuts import estim_class_model, "
        "segment_graph_cut_general\n"
        "np.random.seed(0)\n"
        "img = np.random.random((96, 128, 3)) * 0.2\n"
        "img[:, 64:] += 0.7\n"
        "img = (img * 255).clip(0, 255)\n"
        "slic, fts = compute_color2d_superpixels_features("
        "img, {'color': ['mean', 'std', 'energy']}, sp_size=16, sp_regul=0.2)\n"
        "model = estim_class_model(fts, 2, 'GMM')\n"
        "proba = model.predict_proba(fts)\n"
        "gl = segment_graph_cut_general(slic, proba, img, fts, 1.0, 'model')\n"
        "sc = dict(model.named_steps)['std_scaler']\n"
        "mm = dict(model.named_steps)['model']\n"
        "np.savez(%r, img=img, segm=gl[slic], scaler_mean=sc.mean_, "
        "scaler_scale=sc.scale_, w=mm.weights_, m=mm.means_, "
        "c=mm.covariances_)\n"
        "print('nsp', slic.max() + 1)\n" % str(path))
    assert 'nsp' in stdout

    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.models.class_model import ClassModel
    from pyimsegm_tpu.models.gmm import GMMParams
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    npz = np.load(path)
    model = ClassModel(jnp.asarray(npz['scaler_mean'], jnp.float32),
                       jnp.asarray(npz['scaler_scale'], jnp.float32),
                       None, None, None,
                       GMMParams(jnp.asarray(npz['w'], jnp.float32),
                                 jnp.asarray(npz['m'], jnp.float32),
                                 jnp.asarray(npz['c'], jnp.float32)))
    ours, _ = pipelines.segment_color2d_slic_features_model_graphcut(
        npz['img'], model, {'color': ['mean', 'std', 'energy']},
        sp_size=16, sp_regul=0.2, gc_regul=1.0, gc_edge_type='model')
    ars = float(adjusted_rand_score(jnp.asarray(npz['segm']).ravel(),
                                    jnp.asarray(ours).ravel()))
    # 0.85: on this tiny noise image (~48 superpixels) a couple of boundary
    # superpixels flipping between equally-valid tessellations moves ARS by
    # several points; the test guards harness breakage, not exact parity
    # (QUALITY.md holds the measured real-image numbers)
    assert ars > 0.85, ars


def test_shim_slic_follows_spec():
    """Structural conformance of the shim SLIC (what the reference
    executes) and our device SLIC: on an image with one strong geometric
    edge, both tessellations must snap their superpixels to it (pixelwise
    label-agreement between two SLIC implementations is NOT a meaningful
    assertion — on noise-dominated images basins are chaotic and even two
    runs of the same implementation diverge)."""
    sys.path.insert(0, os.path.join(REPO, 'tools', 'refrun', 'shims'))
    try:
        import skimage.segmentation as shim_seg
    finally:
        sys.path.pop(0)

    from pyimsegm_tpu import superpixels

    h, w, r = 128, 160, 40
    yy, xx = np.mgrid[0:h, 0:w]
    disk = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) <= r * r
    rng = np.random.default_rng(0)
    img = np.full((h, w, 3), 40, np.float64)
    img[disk] = 200
    img += rng.normal(0, 4, img.shape)
    img8 = img.clip(0, 255).astype(np.uint8)

    def disk_iou(labels):
        # majority-vote the superpixels onto the disk mask and check the
        # reconstruction: superpixels must not straddle the edge
        rec = np.zeros_like(disk)
        for lb in np.unique(labels):
            sel = labels == lb
            rec[sel] = disk[sel].mean() > 0.5
        return (rec & disk).sum() / float((rec | disk).sum())

    ours = superpixels.segment_slic_img2d(img8, sp_size=16,
                                          relative_compact=0.2)
    imgn = (img8 - img8.min()) / float(img8.max() - img8.min())
    theirs = shim_seg.slic(imgn, n_segments=int(h * w / 16 ** 2),
                           compactness=(16 * 0.2) ** 1.5, sigma=1,
                           enforce_connectivity=True)
    iou_ours, iou_theirs = disk_iou(np.asarray(ours)), disk_iou(theirs)
    assert iou_ours > 0.95, iou_ours
    assert iou_theirs > 0.95, iou_theirs
