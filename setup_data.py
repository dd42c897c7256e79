#!/usr/bin/env python3
"""Data setup: ESC-50 reorg + synthetic samples (reference: setup_data.py)."""

from cough_detector_tpu.cli.prepare_data import main

if __name__ == "__main__":
    main(["--output-dir", "./data"])
