#!/usr/bin/env bash
# Full pipeline: data setup -> COUGHVID -> production training
# (reference: run_all.sh). Assumes dependencies are already installed
# (jax/flax/optax baked into the TPU image).
set -e

echo "=== Step 1/4: download ESC-50 ==="
python download_esc50.py

echo "=== Step 2/4: COUGHVID + ESC-50 data setup ==="
python -m cough_detector_tpu.cli.setup_coughvid --output-dir ./data

echo "=== Step 3/4: train production (residual) model ==="
python train_with_data.py ./data

echo "=== Step 4/4: benchmark ==="
python bench.py

echo "Done. Run: python run_detection.py --model ./checkpoints/best_model"
