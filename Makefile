# anuraxla developer entry points
.PHONY: native test test-fast test-tpu bench e2e-demo clean

native:
	python -m anuraxla.native.build

test: native
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_pipeline_e2e.py --ignore=tests/test_stream.py

# real-chip kernel goldens (bf16 error bound, Mosaic layouts, int8 conv) —
# run whenever a kernel file changes; needs a TPU attached (self-skips
# otherwise). First compile through a remote-compile relay can take minutes.
test-tpu:
	ANURAXLA_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q -p no:cacheprovider

bench:
	python bench.py

# full synthetic end-to-end demo into ./demo_project
e2e-demo:
	rm -rf demo_project && mkdir -p demo_project/models
	python -m anuraxla make-synth-data --root demo_project/latent_space_exploration --per-species 48
	cp demo_project/latent_space_exploration/config.json demo_project/config.json
	cd demo_project && TRAIN_STEPS=50 bash ../scripts/run_full_pipeline.sh

clean:
	rm -rf anuraxla/native/libavldwav.so demo_project
	find . -name __pycache__ -type d -exec rm -rf {} +
