"""`OleFileIO_PL` stand-in backed by this repo's from-scratch MS-CFB
reader (`pyimsegm_tpu/utils/read_zvi.py`), which exposes the same
``listdir``/``openstream`` surface the reference's ZVI loader uses."""

from pyimsegm_tpu.utils.read_zvi import CompoundFile as OleFileIO  # noqa: F401
