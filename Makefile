# Developer convenience targets.

PY ?= python
# Hermetic CPU test environment (8 virtual devices for the sharding tier).
TEST_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast native bench lint clean

test:
	env $(TEST_ENV) $(PY) -m pytest tests/ -q

test-fast:
	env $(TEST_ENV) $(PY) -m pytest tests/ -q -x \
	    --ignore=tests/test_sam_parity.py --ignore=tests/test_parallel.py \
	    --ignore=tests/test_native_cpp.py

native:
	cmake -S native -B native/build -G Ninja
	cmake --build native/build

bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q dlimgedit_tpu tests tools examples

clean:
	rm -rf native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
