# Convenience targets (counterpart of the reference Makefile's run/tensorboard
# targets, reference Makefile:1-15).

.PHONY: test test-fast train bench native clean tensorboard

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_reference_parity.py

train:
	python -m spair_pytorch_tpu.train --preset paper128 --steps 50000

bench:
	python bench.py

native:
	$(MAKE) -C native

tensorboard:
	tensorboard --logdir runs --port 6006

clean:
	rm -rf __pycache__ spair_pytorch_tpu/**/__pycache__ .pytest_cache
	$(MAKE) -C native clean
