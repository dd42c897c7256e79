#!/usr/bin/env python3
"""Download ESC-50 (reference: download_esc50.py)."""

from cough_detector_tpu.data.acquire import download_esc50

if __name__ == "__main__":
    download_esc50("./datasets")
