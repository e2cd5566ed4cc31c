"""3D gray-volume pipeline (`pipe_gray3d_slic_features_model_graphcut`)."""

import numpy as np

from pyimsegm_tpu import pipelines
from pyimsegm_tpu.ops.slic3d import segment_slic_img3d_gray
import pytest

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


def test_slic3d_segments_volume(rng):
    vol = rng.random((8, 32, 48)).astype(np.float32)
    labels = segment_slic_img3d_gray(vol, sp_size=8, relative_compact=0.3,
                                     space=(2, 1, 1))
    assert labels.shape == vol.shape
    assert labels.max() > 4


def test_pipe_gray3d_two_phase(rng):
    # two-phase volume along width
    vol = np.zeros((6, 24, 36), np.float32)
    vol[:, :, 18:] = 1.0
    vol += rng.normal(0, 0.05, vol.shape).astype(np.float32)
    segm = pipelines.pipe_gray3d_slic_features_model_graphcut(
        vol, nb_classes=2, dict_features={'color': ['mean']},
        spacing=(2, 1, 1), sp_size=6, sp_regul=0.2, gc_regul=0.1)
    assert segm.shape == vol.shape
    left = segm[:, :, :14]
    right = segm[:, :, 22:]
    # each side dominated by a single (different) class
    lab_l = np.bincount(left.ravel()).argmax()
    lab_r = np.bincount(right.ravel()).argmax()
    assert lab_l != lab_r
    assert np.mean(left == lab_l) > 0.9
    assert np.mean(right == lab_r) > 0.9
