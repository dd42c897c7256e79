#!/usr/bin/env python3
"""Improved dataset curation: 9-class ESC-50 negatives + synthetic
pink/ambient negatives (reference: prepare_data.py)."""

from cough_detector_tpu.cli.prepare_data import main

if __name__ == "__main__":
    main()
