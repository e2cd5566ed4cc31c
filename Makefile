# Dev entry points (counterpart of the reference's Makefile).

.PHONY: test test-fast test-tpu bench bench-all ref-walls docs parity refrun native clean

test:
	python -m pytest tests/ -q

# fast tier: skips the compile-heavy e2e tests (target < 5 min)
test-fast:
	python -m pytest tests/ -q -m "not slow"

# kernel-parity tests on the real chip (needs the TPU tunnel live)
test-tpu:
	PYIMSEGM_TEST_TPU=1 python -m pytest tests/test_grid_pallas.py \
	    tests/test_enforce_pallas.py tests/test_connectivity_pallas.py \
	    tests/test_slic_multi_pallas.py tests/test_slic3d_pallas.py -q

bench:
	python bench.py

# all BASELINE configs (1,2,4,5,6 beyond the headline)
bench-all:
	python bench_all.py

# measure the ACTUAL reference's CPU walls for the same recipes
ref-walls:
	python tools/refrun/time_reference.py

# regenerate docs/api/ from docstrings
docs:
	JAX_PLATFORMS=cpu python tools/gen_api_docs.py

# TPU-vs-CPU end-to-end ARS acceptance check (BASELINE: >= 0.98)
parity:
	python tools/check_parity.py

# run the ACTUAL reference via tools/refrun shims + score ourselves against it
refrun:
	python tools/refrun/run_reference.py all
	python tools/refrun/compare.py

native:
	$(MAKE) -C pyimsegm_tpu/native

clean:
	rm -rf .pytest_cache
	find . -name '__pycache__' -type d -exec rm -rf {} +
	rm -f pyimsegm_tpu/native/*.so
