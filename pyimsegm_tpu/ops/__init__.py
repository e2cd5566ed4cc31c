"""TPU compute ops: SLIC, segment statistics, filter banks, graphs, MRF solvers."""
