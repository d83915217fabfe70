# cortex_tpu developer targets (parity: reference Makefile)

PY ?= python

.PHONY: test test-fast bench serve native clean lint examples

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

serve:
	$(PY) -m cortex_tpu serve

native:
	g++ -O3 -march=native -shared -fPIC \
	  -o cortex_tpu/native/libgraphcore.so cortex_tpu/native/graphcore.cpp

examples:
	$(PY) examples/basic_usage.py
	$(PY) examples/graph_queries.py
	$(PY) examples/auto_linker.py

clean:
	rm -rf cortex_tpu/native/libgraphcore.so .pytest_cache \
	  $(shell find . -name __pycache__ -type d 2>/dev/null)
