"""Live microphone capture — host side, unchanged architecture from the
reference: an audio-callback producer feeding a queue drained by a consumer
thread (reference: src/inference.py:250-451). PortAudio backends
(sounddevice → pyaudio fallback) are gated imports; the device side is the
jitted StreamingDetector tick.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Optional

import numpy as np

try:  # pragma: no cover - host audio stacks are absent in CI
    import sounddevice as sd

    SOUNDDEVICE_AVAILABLE = True
except Exception:
    SOUNDDEVICE_AVAILABLE = False

try:  # pragma: no cover
    import pyaudio

    PYAUDIO_AVAILABLE = True
except Exception:
    PYAUDIO_AVAILABLE = False


class RealtimeMicrophoneDetector:
    """Producer/consumer mic loop around a CoughDetectorInference engine
    (reference: src/inference.py:250-429)."""

    def __init__(
        self,
        inference_engine,
        sample_rate: int = 16000,
        chunk_duration: float = 0.1,
        device_index: Optional[int] = None,
        backend: str = "auto",
    ):
        self.inference = inference_engine
        self.sample_rate = sample_rate
        self.chunk_size = int(sample_rate * chunk_duration)
        self.device_index = device_index

        if backend == "auto":
            if SOUNDDEVICE_AVAILABLE:
                backend = "sounddevice"
            elif PYAUDIO_AVAILABLE:
                backend = "pyaudio"
            else:
                raise RuntimeError(
                    "No audio backend available. Install sounddevice or pyaudio."
                )
        self.backend = backend

        self.running = False
        self.audio_queue: "queue.Queue" = queue.Queue()
        self.on_detection: Optional[Callable] = None

    # -- consumer --------------------------------------------------------

    def _process_audio(self) -> None:
        while self.running:
            try:
                chunk = self.audio_queue.get(timeout=0.5)
            except queue.Empty:
                continue
            try:
                result = self.inference.process_audio_chunk(chunk.flatten())
            except Exception as e:  # surfaced, never silently dropped
                print(f"Error processing audio: {e}")
                continue
            if result is not None:
                timestamp, confidence = result
                print(
                    f"\n🔊 COUGH DETECTED at "
                    f"{timestamp.strftime('%Y-%m-%d %H:%M:%S.%f')[:-3]}"
                )
                print(f"   Confidence: {confidence:.2%}")
                if self.on_detection:
                    self.on_detection(timestamp, confidence)

    # -- producers -------------------------------------------------------

    def _start_sounddevice(self) -> None:  # pragma: no cover
        def callback(indata, frames, time_info, status):
            if status:
                print(f"Audio status: {status}")
            self.audio_queue.put(indata.copy())

        self.stream = sd.InputStream(
            samplerate=self.sample_rate,
            channels=1,
            dtype="float32",
            blocksize=self.chunk_size,
            device=self.device_index,
            callback=callback,
        )
        self.stream.start()
        print("Listening for coughs... (Press Ctrl+C to stop)")

    def _start_pyaudio(self) -> None:  # pragma: no cover
        self.pa = pyaudio.PyAudio()

        def callback(in_data, frame_count, time_info, status):
            self.audio_queue.put(np.frombuffer(in_data, dtype=np.float32))
            return (None, pyaudio.paContinue)

        self.stream = self.pa.open(
            format=pyaudio.paFloat32,
            channels=1,
            rate=self.sample_rate,
            input=True,
            input_device_index=self.device_index,
            frames_per_buffer=self.chunk_size,
            stream_callback=callback,
        )
        self.stream.start_stream()
        print("Listening for coughs... (Press Ctrl+C to stop)")

    # -- lifecycle -------------------------------------------------------

    def start(self) -> None:
        if self.running:
            return
        self.running = True
        self.inference.reset()
        self.process_thread = threading.Thread(target=self._process_audio)
        self.process_thread.start()
        if self.backend == "sounddevice":
            self._start_sounddevice()
        elif self.backend == "pyaudio":
            self._start_pyaudio()

    def stop(self) -> None:
        self.running = False
        if hasattr(self, "stream"):  # pragma: no cover
            if self.backend == "sounddevice":
                self.stream.stop()
                self.stream.close()
            else:
                self.stream.stop_stream()
                self.stream.close()
                self.pa.terminate()
        if hasattr(self, "process_thread"):
            self.process_thread.join(timeout=2.0)
        print("\nStopped listening.")

    def run(self) -> None:
        self.start()
        try:
            while self.running:
                time.sleep(0.1)
        except KeyboardInterrupt:
            print("\nInterrupted by user")
        finally:
            self.stop()


def list_audio_devices() -> None:
    """Enumerate input devices for both backends
    (reference: src/inference.py:432-451)."""
    print("Available audio input devices:\n")
    if SOUNDDEVICE_AVAILABLE:  # pragma: no cover
        print("sounddevice devices:")
        for i, dev in enumerate(sd.query_devices()):
            if dev["max_input_channels"] > 0:
                print(f"  [{i}] {dev['name']} ({dev['max_input_channels']} ch)")
        print()
    if PYAUDIO_AVAILABLE:  # pragma: no cover
        print("pyaudio devices:")
        pa = pyaudio.PyAudio()
        for i in range(pa.get_device_count()):
            info = pa.get_device_info_by_index(i)
            if info["maxInputChannels"] > 0:
                print(f"  [{i}] {info['name']} ({info['maxInputChannels']} ch)")
        pa.terminate()
    if not SOUNDDEVICE_AVAILABLE and not PYAUDIO_AVAILABLE:
        print("(no host audio backend installed)")
