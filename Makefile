# aprilgrid-tpu developer targets
.PHONY: test bench benchall bench4k benchblur charts native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

benchall:
	python tools/bench_detection.py

bench4k:
	python tools/bench_4k.py

benchblur:
	python tools/bench_blur.py

charts:
	python tools/generate_aprilgrid.py -t t36h11 -x 6 -y 6 --out-dir charts

native:
	python -c "from aprilgrid_tpu.native import build; print(build(force=True))"

clean:
	rm -rf .jax_cache aprilgrid_tpu/native/libagsearch.so charts
	find . -name __pycache__ -type d -exec rm -rf {} +
