# Same CLI surface as the reference Makefile (train/infer/test/format/lint),
# plus TPU-native extras (bench, cache).

CONFIG = best.yml

TEXT = "Hello World and goodbye"
SOURCE = "data/lineImages/r07/r07-475/r07-475z-01.tif"
EXP = "data/best_exp"
OUTPUT = "prediction"
CHECKPOINT =

.PHONY: install train infer infer-batch test bench format lint cache export \
	serve eval metrics

# HTTP serving with continuous batching (PORT=8008; SOURCE may be a
# comma-separated style bank, selectable per request).
serve:
	python -m dhg.serve --experiment_path=$(EXP) --port=$(or $(PORT),8008) \
		--source=$(SOURCE)

# Score a saved checkpoint on a split (SPLIT=validation|train).
eval:
	python -m dhg.eval --experiment_path=$(EXP) \
		$(if $(SPLIT),--split=$(SPLIT))

# Generation-quality metrics (KS stroke stats + Frechet style distance).
metrics:
	python -m dhg.metrics --experiment_path=$(EXP)

# dhg checkpoint -> reference-loadable .pth (inverse of the torch converter)
export:
	python -m dhg.tools.export_torch_checkpoint --experiment_path=$(EXP) \
		--dst=$(OUTPUT).pth

install:
	pip install -e . || true  # deps are baked into the TPU image

train:
	python -m dhg.train --config=$(CONFIG)

infer:
ifdef CHECKPOINT
	python -m dhg.inference --prompt=$(TEXT) --source=$(SOURCE) \
		--experiment_path=$(EXP) --checkpoint_path=$(CHECKPOINT) --output=$(OUTPUT)
else
	python -m dhg.inference --prompt=$(TEXT) --source=$(SOURCE) \
		--experiment_path=$(EXP) --output=$(OUTPUT)
endif

# PROMPTS=<file with one prompt per line> -> $(OUTPUT)_000.png, _001.png, ...
infer-batch:
	python -m dhg.inference --prompts_file=$(PROMPTS) --source=$(SOURCE) \
		--experiment_path=$(EXP) --output=$(OUTPUT)

test:
	python -m pytest -q tests

bench:
	python bench.py

format:
	ruff format dhg tests || true

lint:
	ruff check dhg tests || true
