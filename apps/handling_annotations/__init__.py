"""Annotation-handling CLIs (counterpart of
`/root/reference/handling_annotations/`)."""
