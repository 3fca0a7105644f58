# Developer entry points (C49 parity: the reference's tox/travis targets).
.PHONY: test test-fast bench native lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow" \
	    --ignore=tests/test_models.py --ignore=tests/test_fit.py

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -o pctpu/native/_fastio.so \
	    pctpu/native/fastio.cpp -lpthread
	g++ -O3 -std=c++17 -shared -fPIC -o pctpu/native/_spatial.so \
	    pctpu/native/spatial.cpp -lpthread

lint:
	python -m compileall -q pctpu tests
	python tools/lint.py
