#!/usr/bin/env python3
"""Quick ESC-50-only training sanity run (reference: train_quick.py):
model=small, 50 epochs. Produces a working checkpoint, not a production
model (README.md:392-393 expectations)."""

from cough_detector_tpu.cli.train import main

if __name__ == "__main__":
    main([
        "--model-type", "small",
        "--epochs", "50",
        "--output-dir", "./checkpoints",
        "--num-workers", "4",
    ])
