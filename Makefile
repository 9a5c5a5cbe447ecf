# PALLAS_AXON_POOL_IPS= disables the axon TPU plugin for CPU-only processes
# (the plugin contacts the exclusive TPU tunnel at interpreter start and two
# concurrent JAX processes deadlock; see .claude/skills/verify/SKILL.md).
TESTENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1

.PHONY: test bench golden native clean

test:
	$(TESTENV) python -m pytest tests/ -x -q

bench:
	python bench.py

golden:
	$(TESTENV) python tests/make_golden.py

native:
	$(MAKE) -C native

clean:
	rm -rf bfqzip_tpu/**/__pycache__ tests/__pycache__ .pytest_cache
