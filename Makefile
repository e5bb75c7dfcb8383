# Developer entry points (counterpart of the reference's Makefile +
# pre-push lint hooks)

.PHONY: test test-fast bench native lint clean

# FULL suite, both tiers (-m "" overrides the default "-m 'not slow'"
# in pyproject.toml)
test:
	python -m pytest tests/ -q -m ""

# default quick tier only (same as a bare `pytest tests/ -q`)
test-fast:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C acmpc_tpu/native

lint:
	python -m compileall -q acmpc_tpu tests bench.py __graft_entry__.py

clean:
	$(MAKE) -C acmpc_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
