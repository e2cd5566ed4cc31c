"""On-device class models (unsupervised + supervised) for superpixel features."""

from pyimsegm_tpu.models.class_model import ClassModel, estim_class_model  # noqa: F401
