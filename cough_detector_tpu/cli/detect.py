"""Real-time / offline detection CLI — flag-compatible with the reference
(reference: src/inference.py:454-503, run_detection.py) plus file-input and
multi-stream serving modes the reference lacks."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Real-time cough detection")
    p.add_argument("--model", type=str, required=False,
                   help="Checkpoint: Orbax dir or reference .pt")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--smoothing", type=int, default=3)
    p.add_argument("--debounce", type=float, default=0.5)
    p.add_argument("--device", type=str, default="auto",
                   help="Accepted for reference-CLI parity")
    p.add_argument("--audio-device", type=int, default=None)
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "sounddevice", "pyaudio"])
    p.add_argument("--list-devices", action="store_true")
    p.add_argument("--quiet", action="store_true")
    # Beyond-reference modes:
    p.add_argument("--wav", type=str, default=None,
                   help="Run detection over a wav file instead of the mic")
    p.add_argument("--streams", type=int, default=1,
                   help="Concurrent stream lanes for batched serving")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..stream import (
        CoughDetectorInference,
        RealtimeMicrophoneDetector,
        StreamingDetector,
        list_audio_devices,
    )

    if args.list_devices:
        list_audio_devices()
        return
    if not args.model:
        raise SystemExit("--model is required (unless --list-devices)")

    if args.wav:
        # Offline file mode scores every sliding window in ONE batched
        # device program (stream/offline.py) — identical detections to
        # streaming, minus the per-tick dispatch.
        from ..data import audio_io
        from ..stream.detector import _load_any_checkpoint
        from ..stream.offline import score_recording

        wave = audio_io.load_mono_16k(args.wav)
        variables, config = _load_any_checkpoint(args.model)
        events = score_recording(
            wave, variables, config,
            hop_duration=0.25,
            threshold=args.threshold,
            smoothing_window=args.smoothing,
            debounce_seconds=args.debounce,
        )
        if not events:
            print("No coughs detected.")
        for ev in events:
            print(
                f"cough at t={ev.time_seconds:.2f}s "
                f"(confidence {ev.confidence:.2%})"
            )
        return

    inference = CoughDetectorInference(
        model_path=args.model,
        device=args.device,
        confidence_threshold=args.threshold,
        smoothing_window=args.smoothing,
        debounce_seconds=args.debounce,
        verbose=not args.quiet,
    )
    detector = RealtimeMicrophoneDetector(
        inference_engine=inference,
        sample_rate=inference.config.get("sample_rate", 16000),
        device_index=args.audio_device,
        backend=args.backend,
    )
    detector.run()


if __name__ == "__main__":
    main()
