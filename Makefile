.PHONY: all native test test-quick test-fast bench dryrun ci ci-full tpu-smoke tpu-smoke-full verify-real clean

# Local mirror of .github/workflows/ci.yml — quick tier (~2 min): every
# subsystem's light tests + the multi-chip dryrun. `make ci-full` runs
# the complete suite (~25 min) like the GitHub workflow.
ci: native
	python -m pytest tests/ -q -m "not slow"
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

ci-full: native
	python -m pytest tests/ -q
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-quick:
	python -m pytest tests/ -q -m "not slow"

test-fast:
	python -m pytest tests/ -q -x

bench:
	python bench.py

# Weights-free real-chip smoke: Mosaic-compiles every Pallas kernel on
# the attached TPU (no interpret mode) and checks numerics vs XLA.
tpu-smoke:
	python scripts/tpu_kernel_check.py

# adds the fused decode paths only reachable past the VMEM budget
# (both round-4 Mosaic alignment failures lived there) — slower
tpu-smoke-full: tpu-smoke
	python scripts/tpu_decode_check.py

# One-command real-weight gate (runs the moment a checkpoint is
# available; see docs and scripts/eval_fixtures.py):
#   make verify-real MODEL_DIR=/path/to/Qwen3-ASR-0.6B
# Asserts exact transcripts on the three reference fixtures at f32,
# then reports bf16/lm8/int8/int4 WER deltas, then drives the CLI
# contract end to end.
verify-real:
	@test -n "$(MODEL_DIR)" || (echo "usage: make verify-real MODEL_DIR=/path/to/model" && exit 1)
	python scripts/eval_fixtures.py $(MODEL_DIR) --assert-exact
	python scripts/eval_fixtures.py $(MODEL_DIR) --compare
	python -m qwen3_asr_rs_tpu $(MODEL_DIR) /root/reference/test_audio/sample1.wav
	python -m qwen3_asr_rs_tpu $(MODEL_DIR) /root/reference/test_audio/sample3.wav chinese

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
