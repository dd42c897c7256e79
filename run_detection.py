#!/usr/bin/env python3
"""Live cough detection entry point (reference: run_detection.py)."""

from cough_detector_tpu.cli.detect import main

if __name__ == "__main__":
    main()
