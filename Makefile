.PHONY: all native test test-fast bench dryrun ci clean

# Local mirror of .github/workflows/ci.yml (build -> tests -> dryrun)
ci: native
	python -m pytest tests/ -q
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
