PY ?= python

.PHONY: test test-fast test-quick bench demo dryrun lint synthetic-weights

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_components.py \
		--ignore=tests/test_models.py --ignore=tests/test_checkpoint.py

# one representative test per subsystem, <5 min (marker in pyproject.toml)
test-quick:
	$(PY) -m pytest tests/ -q -m quick

# synthetic trained checkpoint bundle: unlocks the weights-gated golden
# parity + int8 + hand-scale accuracy gates (tools/make_synthetic_weights.py;
# conftest points ISLX_WEIGHTS_DIR here automatically when it exists)
synthetic-weights:
	$(PY) tools/make_synthetic_weights.py --out .synthetic_weights

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
