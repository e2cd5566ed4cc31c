"""`nibabel` stand-in: just enough for `imsegm.utilities.data_io` to import
and for its NIfTI load/save helpers to function, backed by this repo's
self-contained NIfTI-1 codec (`pyimsegm_tpu/utils/nifti.py`)."""

import numpy as np


class Nifti1Image:
    def __init__(self, dataobj, affine=None):
        self._data = np.asarray(dataobj)
        self.affine = affine if affine is not None else np.eye(4)

    def get_fdata(self):
        return self._data.astype(np.float64)

    get_data = get_fdata


def load(path):
    from pyimsegm_tpu.utils import nifti
    return Nifti1Image(nifti.load_nifti(path))


def save(img, path):
    from pyimsegm_tpu.utils import nifti
    nifti.save_nifti(path, img.get_fdata())
