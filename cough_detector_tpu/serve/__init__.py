"""Network serving tier: many clients, one batched on-device detector.

The reference's serving story stops at an in-process mic loop
(reference: src/inference.py:250-451); this package adds the production
surface on top of `stream.StreamingDetector`: a socket server whose device
side stays one SPMD tick for all connected streams, a client, and the wire
protocol. CLI: `python -m cough_detector_tpu.cli.serve` / `cdt-serve`.
"""

from .client import DetectionClient, ServerRefused
from .server import (
    DetectionServer,
    dequantize_mulaw,
    h2d_silence,
    quantize_i16,
    quantize_mulaw,
)
from .stats_http import StatsHttpServer

__all__ = [
    "DetectionClient", "DetectionServer", "ServerRefused",
    "StatsHttpServer",
    "dequantize_mulaw", "h2d_silence", "quantize_i16", "quantize_mulaw",
]
