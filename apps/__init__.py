"""Experiment applications (L4): argparse+YAML driven, file-in/file-out CLIs.

Counterparts of the reference's experiment scripts
(`/root/reference/experiments_segmentation/`, `experiments_ovary_centres/`,
`experiments_ovary_detect/`, `handling_annotations/`), running the
pyimsegm_tpu device pipelines instead of multiprocessing pools.
"""
