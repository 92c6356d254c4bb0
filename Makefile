.PHONY: test test-fast native train-predict bench clean

PY ?= python

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow" -x

native:
	$(PY) -c "from graph_physics_tpu import native; assert native.available(), 'build failed'; print('libmeshops ok')"

# Full pipeline smoke on synthetic data (the reference Makefile's
# train-predict analog): train 1 epoch -> resume -> predict+export.
train-predict:
	$(PY) scripts/train_predict_smoke.py

bench:
	$(PY) bench.py

clean:
	rm -rf build dist *.egg-info graph_physics_tpu/native/libmeshops.so
	find . -name __pycache__ -type d -exec rm -rf {} +
