.PHONY: requirements data features train predict select model_data \
	viirs evaluate report clean lint test bench tpu_test help \
	create_environment test_environment native docs \
	sync_data_to_s3 sync_data_from_s3 sync_data_to sync_data_from

PYTHON_INTERPRETER = python
ROOT ?= data

## Install Python dependencies (reference Makefile:27-29)
requirements:
	$(PYTHON_INTERPRETER) -m pip install -e . --no-build-isolation

## Generate dataset (the reference's `make data` ran the nonexistent
## src/data/make_dataset.py, Makefile:32-33 — this one exists)
data:
	$(PYTHON_INTERPRETER) -m plumekit.cli make_dataset --root $(ROOT)

## Run the classical identify pipeline (weak labeller)
features:
	$(PYTHON_INTERPRETER) -m plumekit.cli build_features --root $(ROOT)

## Train the U-Net
train:
	$(PYTHON_INTERPRETER) -m plumekit.cli train_model --root $(ROOT)

## Full-granule inference
predict:
	$(PYTHON_INTERPRETER) -m plumekit.cli predict_model --root $(ROOT)

## Continuous serving: watch the granule dir, predict new arrivals
serve:
	$(PYTHON_INTERPRETER) -m plumekit.cli serve --root $(ROOT)

## Stage plume curation artifacts for human review
select:
	$(PYTHON_INTERPRETER) -m plumekit.cli select --root $(ROOT)

## Curated hulls -> model-ready training samples
model_data:
	$(PYTHON_INTERPRETER) -m plumekit.cli prepare_model_data --root $(ROOT)

## Reproject VIIRS SDR swaths onto UTM grids
viirs:
	$(PYTHON_INTERPRETER) -m plumekit.cli resample_viirs --root $(ROOT) --quicklooks

## Score the trained model against model-ready labels
evaluate:
	$(PYTHON_INTERPRETER) -m plumekit.cli evaluate_model --root $(ROOT)

## Measure serving geometries on the attached chip and persist the winner
tune:
	$(PYTHON_INTERPRETER) -m plumekit.cli tune --root $(ROOT) --int8

## Campaign summary markdown + figures (the reference's promised
## reports/ content, reference README.md:50-52)
report:
	$(PYTHON_INTERPRETER) -m plumekit.cli report --root $(ROOT)

## Delete compiled python files (reference Makefile:36-38)
clean:
	find . -type f -name "*.py[co]" -delete
	find . -type d -name "__pycache__" -exec rm -rf {} +

## Lint (reference Makefile:41-42; flake8 config in setup.cfg)
lint:
	flake8 plumekit || true

## Run the test suite
test:
	$(PYTHON_INTERPRETER) -m pytest tests/ -q

## On-chip parity tests (real TPU; the main suite forces CPU)
tpu_test:
	PLUMEKIT_RUN_TPU=1 $(PYTHON_INTERPRETER) -m pytest tests/test_tpu_only.py \
		-q -p no:cacheprovider --noconftest

## Run the benchmark (one JSON line); on a TPU session the on-chip
## parity tests gate the number — a Mosaic regression fails the target
bench: tpu_test
	$(PYTHON_INTERPRETER) bench.py

## Environment bootstrap parity (reference Makefile:60-77 created a
## python=2.7 conda env; plumekit targets the already-provisioned
## interpreter, so this just verifies it)
create_environment: test_environment
	@echo ">>> plumekit uses the active interpreter; no env created."

## Reference Makefile:76-77 analogue (checks Python >= 3.10 + deps)
test_environment:
	$(PYTHON_INTERPRETER) -m pytest tests/test_environment.py -q

## Build the HTML docs (reference Makefile docs skeleton analogue;
## needs sphinx + myst-parser — absent in the pinned build env by design)
docs:
	@python -c "import sphinx" 2>/dev/null && \
	 sphinx-build -b html docs docs/_build/html || \
	 echo "sphinx not installed; docs/ is readable as markdown directly"

## Build the native library
native:
	$(PYTHON_INTERPRETER) plumekit/native/build.py --force

help:
	@grep -E '^##' -A1 Makefile | sed 's/^## //'

## Sync data to/from object storage (reference Makefile:45-58: aws s3
## sync with an optional named PROFILE). Same contract here: set BUCKET
## (required) and PROFILE (optional; "default" means no --profile flag,
## matching the reference's ifeq).
PROFILE ?= default
S3_PROFILE_FLAG = $(if $(filter default,$(PROFILE)),,--profile $(PROFILE))
sync_data_to_s3:
	@command -v aws >/dev/null || \
	 { echo "awscli not installed (zero-egress environment)"; exit 1; }
	aws s3 sync $(ROOT)/ s3://$(BUCKET)/data/ $(S3_PROFILE_FLAG)
sync_data_from_s3:
	@command -v aws >/dev/null || \
	 { echo "awscli not installed (zero-egress environment)"; exit 1; }
	aws s3 sync s3://$(BUCKET)/data/ $(ROOT)/ $(S3_PROFILE_FLAG)

## rsync twins for hosts without S3 (DEST may be a path or host:path),
## degrading to cp -a for local paths when rsync itself is absent —
## the working data-movement analogue in this environment
sync_data_to:
	@test -n "$(DEST)" || { echo "set DEST=<path|host:path>"; exit 1; }
	@if command -v rsync >/dev/null; then \
	 rsync -a --info=stats1 $(ROOT)/ $(DEST)/; \
	 else mkdir -p $(DEST) && cp -a $(ROOT)/. $(DEST)/; fi
sync_data_from:
	@test -n "$(DEST)" || { echo "set DEST=<path|host:path>"; exit 1; }
	@if command -v rsync >/dev/null; then \
	 rsync -a --info=stats1 $(DEST)/ $(ROOT)/; \
	 else mkdir -p $(ROOT) && cp -a $(DEST)/. $(ROOT)/; fi
