"""Streaming serving: jit ring buffer, multi-stream detector, mic capture."""

from .detector import CoughDetectorInference, Detection, StreamingDetector
from .mic import RealtimeMicrophoneDetector, list_audio_devices
from .ring import StreamState, init_state, make_stream_step, stream_step

__all__ = [
    "CoughDetectorInference",
    "Detection",
    "StreamingDetector",
    "RealtimeMicrophoneDetector",
    "list_audio_devices",
    "StreamState",
    "init_state",
    "make_stream_step",
    "stream_step",
]
