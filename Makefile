# fluidnet_tpu build/test entry points.
#
# The JAX/Pallas compute path needs no build step; this drives the native
# C++ host runtime and the test/bench flows.

NATIVE_SRC := fluidnet_tpu/native/src/fluidnet_native.cpp
NATIVE_LIB := fluidnet_tpu/native/libfluidnet_native.so

.PHONY: all native test test-fast bench fixtures clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O3 -shared -fPIC -std=c++17 -pthread $< -o $@

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/test_golden_fixtures.py tests/test_utils_cli.py \
	    tests/test_native.py -q

bench:
	python bench.py

fixtures:
	PYTHONPATH=. python tests/make_fixtures.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
