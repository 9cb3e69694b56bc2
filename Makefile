PY ?= python

.PHONY: test preflight verify bench hooks

# full local test suite (includes tests/test_oracle_parity.py, which
# sweeps ALL declared queries vs their DuckDB oracles at sf0.001 — the
# deferred-past-the-driver-window queries are value-checked here on
# every run, so they cannot regress silently)
test:
	$(PY) -m pytest tests/ -x -q

# driver-style sweep of every declared query at sf0.001 + sf0.01
# (exit != 0 on any oracle mismatch) — run before ending a round
preflight:
	$(PY) scripts/preflight.py /root/testdata/sf0.001
	$(PY) scripts/preflight.py /root/testdata/sf0.01

verify: test preflight

bench:
	$(PY) bench.py

# one-time: route git hooks through the committed .githooks/ directory
hooks:
	git config core.hooksPath .githooks
