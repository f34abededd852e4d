.PHONY: test test-fast bench dryrun lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	timeout 550 python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; g.dryrun_multichip(8)"

lint:
	python -m compileall -q rl_tpu tests examples
