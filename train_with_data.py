#!/usr/bin/env python3
"""Production training path (reference: train_with_data.py): residual
model over ./data, 150 epochs, lr 5e-4, patience 20, no ESC-50 mixing."""

import sys
from pathlib import Path

from cough_detector_tpu.cli.train import main
from cough_detector_tpu.data.acquire import dataset_summary

if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "./data"
    if not Path(data_dir).exists():
        raise SystemExit(
            f"{data_dir} not found — run setup first "
            "(python -m cough_detector_tpu.cli.prepare_data or setup_coughvid)"
        )
    s = dataset_summary(data_dir)
    print(f"Training on {s['cough']} coughs / {s['non_cough']} non-coughs")
    main([
        "--data-dir", data_dir,
        "--model-type", "residual",
        "--epochs", "150",
        "--lr", "0.0005",
        "--patience", "20",
        "--output-dir", "./checkpoints",
        "--no-esc50",
        "--export-pt",
    ])
