# Equivalent of the reference's Makefile (quality/style lint targets,
# /root/reference/Makefile:1-9) plus the targets the reference lacks:
# tests and benchmarks.  black/ruff are not in this image; the lint targets
# fall back to pyflakes via the stdlib-adjacent tooling that is.

check_dirs := parler_tts_tpu tests benchmarks helpers examples

quality:
	@command -v ruff >/dev/null 2>&1 && ruff check $(check_dirs) || \
		python -m pyflakes $(check_dirs) 2>/dev/null || \
		python -m compileall -q $(check_dirs)
	@command -v black >/dev/null 2>&1 && black --check $(check_dirs) || true

style:
	@command -v black >/dev/null 2>&1 && black $(check_dirs) || echo "black not installed"
	@command -v ruff >/dev/null 2>&1 && ruff check --fix $(check_dirs) || true

test:
	python -m pytest tests/ -x -q

test-pallas-compiled:
	PALLAS_COMPILED=1 python -m pytest tests/test_pallas_kernels.py -m pallas_compiled -q

bench:
	python bench.py

.PHONY: quality style test test-pallas-compiled bench
