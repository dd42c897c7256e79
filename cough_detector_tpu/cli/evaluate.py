"""Model evaluation CLI.

Two modes, covering both of the reference's quality procedures:

1. Dataset metrics (default): the reference's validate() pass — loss,
   accuracy, precision/recall/F1 and the confusion matrix over a labeled
   cough/non_cough directory (reference: src/train.py:114-180).
2. --behavioral: the manual validation protocol the reference documents but
   never automates (reference: IMPROVEMENT_PLAN.md:199-216, 316-324):
   false-positives-per-minute on synthetic silence and speech-like audio,
   and detection rate on synthetic coughs, through the streaming detector.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate a cough detector")
    p.add_argument("--model", type=str, required=True,
                   help="Checkpoint: Orbax dir or reference .pt")
    p.add_argument("--data-dir", type=str, default=None,
                   help="Labeled cough/non_cough directory (dataset mode)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--behavioral", action="store_true",
                   help="Run the synthetic behavioral protocol instead")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--minutes", type=float, default=2.0,
                   help="Synthetic audio minutes per behavioral scenario")
    p.add_argument("--seed", type=int, default=0)
    return p


def _dataset_eval(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import BatchLoader, CoughDataset
    from ..models import create_model
    from ..ops import frontend
    from ..stream.detector import _load_any_checkpoint
    from ..train.metrics import EpochAccumulator
    from ..train.steps import eval_step, create_train_state, make_optimizer

    variables, config = _load_any_checkpoint(args.model)
    model = create_model(config.model.model_type)
    ds = CoughDataset(args.data_dir)
    if len(ds) == 0:
        raise SystemExit(f"No clips under {args.data_dir}")
    loader = BatchLoader(
        ds, args.batch_size, config.features, num_workers=args.num_workers
    )

    tx = make_optimizer(config.train, 1)
    state = create_train_state(model, variables, tx)
    fcfg = config.features

    @jax.jit
    def step(waves, labels, mask):
        return eval_step(
            state, waves, labels, jnp.asarray([1.0, 1.0]),
            feature_fn=lambda w: frontend.extract_features_fast(
                frontend.peak_normalize(w), fcfg
            ),
            mask=mask,
        )

    # One jitted code path for full and tail batches: every batch is padded
    # to the compiled shape and the mask keeps padded rows out of loss and
    # counts (steps.eval_step) — no eager re-implementation to drift.
    acc = EpochAccumulator()
    for waves, labels in loader:
        n = waves.shape[0]
        mask = np.zeros(args.batch_size, np.float32)
        mask[:n] = 1.0
        if n < args.batch_size:
            pad = args.batch_size - n
            waves = np.pad(waves, ((0, pad), (0, 0)))
            labels = np.pad(labels, (0, pad))
        acc.update(
            jax.device_get(
                step(jnp.asarray(waves), jnp.asarray(labels), jnp.asarray(mask))
            )
        )
    print(json.dumps(acc.summary()))


def _behavioral_eval(args) -> None:
    import numpy as np

    from ..data import synth
    from ..stream import StreamingDetector

    det = StreamingDetector(
        args.model, num_streams=1, chunk_size=1600,
        confidence_threshold=args.threshold, smoothing_window=3,
        debounce_seconds=0.5,
    )
    sr = 16000
    seconds = int(args.minutes * 60)
    rng = np.random.default_rng(args.seed)

    def run(signal: np.ndarray) -> int:
        det.reset()
        return len(det.process_chunk(signal[None, :]))

    # Scenario 1: silence (target: 0 FP/min, IMPROVEMENT_PLAN.md:320)
    silence = (rng.standard_normal(seconds * sr) * 1e-4).astype(np.float32)
    fp_silence = run(silence) / args.minutes

    # Scenario 2: speech-like babble (target <1 FP/min, :321) — amplitude-
    # modulated band-limited noise approximating speech rhythm. Band-limit
    # to ~4 kHz (speech band) by resampling down and back up.
    from ..data.audio_io import resample_np

    t = np.arange(seconds * sr) / sr
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))  # ~3 Hz syllables
    carrier = rng.standard_normal(seconds * sr).astype(np.float32)
    band_limited = resample_np(
        resample_np(carrier[None], sr, 8000), 8000, sr
    )[0][: seconds * sr]
    speech = (envelope[: len(band_limited)] * band_limited * 0.1).astype(
        np.float32
    )
    fp_speech = run(speech) / args.minutes

    # Scenario 3: coughs every ~5 s (target >80% detection, :322)
    n_coughs = seconds // 5
    signal = (rng.standard_normal(seconds * sr) * 1e-3).astype(np.float32)
    for i in range(n_coughs):
        c = synth.synthetic_cough(args.seed + i, 2.0)
        start = i * 5 * sr
        signal[start : start + len(c)] += c
    detections = run(signal)
    detection_rate = min(detections / max(n_coughs, 1), 1.0)

    print(
        json.dumps(
            {
                "fp_per_min_silence": fp_silence,
                "fp_per_min_speech": fp_speech,
                "cough_detection_rate": detection_rate,
                "targets": {
                    "fp_per_min_silence": 0.0,
                    "fp_per_min_speech": "<1",
                    "cough_detection_rate": ">0.8",
                },
            }
        )
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.behavioral:
        _behavioral_eval(args)
    else:
        if not args.data_dir:
            raise SystemExit("--data-dir required (or use --behavioral)")
        _dataset_eval(args)


if __name__ == "__main__":
    main()
