# anuraxla developer entry points
.PHONY: native test test-fast bench e2e-demo clean

native:
	python -m anuraxla.native.build

test: native
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_pipeline_e2e.py --ignore=tests/test_stream.py

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
