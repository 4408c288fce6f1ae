# Orchestration entrypoints -- the analog of the reference's cargo-make
# tasks (/root/reference/Makefile.toml:20-29) run by its CI on every push
# (/root/reference/.github/workflows/cargo.yml:31-33).

.PHONY: ci ci-fast test bench analysis dryrun

ci:
	scripts/ci.sh

ci-fast:
	scripts/ci.sh --fast

test:
	python -m pytest tests/ -q

bench:
	python bench.py

analysis:
	python scripts/analysis.py

dryrun:
	PYTHONPATH=. JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
