.PHONY: test bench bench-ha lint demo

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-ha:
	python bench_ha.py

demo:  ## stage-1 MagicPoint demo on auto-generated synthetic shapes
	python -m ssp.cli.train train_base configs/magicpoint_shapes_pair.yaml magicpoint_demo
