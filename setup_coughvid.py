#!/usr/bin/env python3
"""COUGHVID download / filter / cap / convert + 17-class ESC-50 hard-negative
merge (reference: setup_coughvid.py)."""

from cough_detector_tpu.cli.setup_coughvid import main

if __name__ == "__main__":
    main()
