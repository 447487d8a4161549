PY ?= python

.PHONY: test test-fast bench demo dryrun lint

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_components.py \
		--ignore=tests/test_models.py --ignore=tests/test_checkpoint.py

bench:
	$(PY) bench.py

demo:
	$(PY) -m islx.cli.demo /root/reference/images/demo.jpg --out /tmp/demo_out.png

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PY) -c \
		"import jax; jax.config.update('jax_platforms','cpu'); \
		import sys; sys.path.insert(0,'.'); \
		import __graft_entry__ as g; g.dryrun_multichip(8)"

lint:
	$(PY) -m compileall -q islx tests bench.py __graft_entry__.py
