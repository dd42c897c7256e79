"""Model evaluation CLI.

Three modes, covering the reference's quality procedures end to end:

1. Dataset metrics (default): the reference's validate() pass — loss,
   accuracy, precision/recall/F1 and the confusion matrix over a labeled
   cough/non_cough directory (reference: src/train.py:114-180).
2. --behavioral: the manual validation protocol the reference documents but
   never automates (reference: IMPROVEMENT_PLAN.md:199-216, 316-324):
   false-positives-per-minute on synthetic silence and speech-like audio,
   and detection rate on synthetic coughs, through the streaming detector.
3. --calibrate: the reference's manual "threshold tuning" step
   (IMPROVEMENT_PLAN.md:210-216) as a measured sweep — scenarios are
   scored once, the engine's threshold+debounce rule is replayed across
   0.05..0.95, and the CLI reports the operating band meeting all three
   targets plus a recommended threshold. A self-check pins the replay to
   the live engine before any sweep number is printed.
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
    p.add_argument("--calibrate", action="store_true",
                   help="Sweep detection thresholds over the behavioral "
                        "scenarios and report the operating band meeting "
                        "all targets + a recommended threshold "
                        "(reference: IMPROVEMENT_PLAN.md:210-216)")
    p.add_argument("--single-device", action="store_true",
                   help="Force single-device eval (default shards the "
                        "batch over all visible chips)")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--grid-step", type=float, default=0.05,
                   help="--calibrate threshold sweep granularity over "
                        "[0.05, 0.99]; 0.01 resolves narrow operating "
                        "bands a 0.05 grid steps over (sweep cost is "
                        "replay-only — scenarios are scored once)")
    p.add_argument("--minutes", type=float, default=2.0,
                   help="Synthetic audio minutes per behavioral scenario")
    p.add_argument("--seed", type=int, default=0)
    return p


def _dataset_eval(args) -> None:
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from ..data.datasets import BatchLoader, CoughDataset
    from ..data.shards import MANIFEST, ShardLoader, dequantize_jnp
    from ..models import model_from_config
    from ..ops import frontend
    from ..parallel import make_mesh, replicate
    from ..stream.detector import _load_any_checkpoint
    from ..train.loop import _make_batch_put
    from ..train.metrics import EpochAccumulator
    from ..train.steps import eval_step, create_train_state, make_optimizer

    variables, config = _load_any_checkpoint(args.model)
    model = model_from_config(config.model)
    if (Path(args.data_dir) / MANIFEST).exists():
        # Packed shard directory (cdt-pack): decode-free bulk scoring.
        loader = ShardLoader(
            args.data_dir, args.batch_size,
            feature_config=config.features,
        )
        n_clips = loader.n_clips
    else:
        ds = CoughDataset(args.data_dir)
        n_clips = len(ds)
        loader = BatchLoader(
            ds, args.batch_size, config.features,
            num_workers=args.num_workers,
        )
    if n_clips == 0:
        raise SystemExit(f"No clips under {args.data_dir}")

    # Bulk scoring is THE throughput CLI: shard the batch axis over all
    # visible chips, exactly like train/featurize/offline (SURVEY.md
    # §2.9). The mask machinery guarantees metrics identical to
    # single-device (tested: test_cli.py::TestEvaluate).
    mesh = (
        None if args.single_device or len(jax.devices()) == 1
        else make_mesh()
    )
    n_shards = mesh.devices.size if mesh is not None else 1

    tx = make_optimizer(config.train, 1)
    state = create_train_state(model, variables, tx)
    class_weights = jnp.asarray([1.0, 1.0])
    if mesh is not None:
        state = replicate(state, mesh)
        class_weights = replicate(class_weights, mesh)
    fcfg = config.features

    @jax.jit
    def step(waves, labels, mask):
        def feature_fn(w):
            w = dequantize_jnp(w)  # int16 shard batches → f32 on device
            return frontend.extract_features_fast(
                frontend.peak_normalize(w), fcfg
            )

        return eval_step(
            state, waves, labels, class_weights,
            feature_fn=feature_fn, mask=mask,
        )

    # One jitted code path for full and tail batches: every batch pads to
    # one mesh-divisible compiled shape and the mask keeps padded rows out
    # of loss and counts (steps.eval_step) — no eager re-implementation to
    # drift, no per-shape recompile.
    pad_to = -(-args.batch_size // n_shards) * n_shards
    put = _make_batch_put(mesh, pad_to)
    acc = EpochAccumulator()
    for waves, labels in loader:
        d_waves, d_labels, d_mask = put((waves, labels))
        acc.update(jax.device_get(step(d_waves, d_labels, d_mask)))
    print(json.dumps(acc.summary()))


def match_detections(det_times, event_starts, span: float = 3.0):
    """Match detection timestamps to known event windows.

    A detection at time t matches event i iff
    event_starts[i] <= t <= event_starts[i] + span; repeated detections
    of one event count once, detections matching no event are spurious.
    Event-count arithmetic (len(detections)/n_events) is NOT a detection
    rate: a double-fire on one cough silently masks a miss elsewhere —
    this matcher is what makes the >80 % behavioral check honest
    (reference protocol: IMPROVEMENT_PLAN.md:316-324).

    Returns (matched_indices, n_spurious).
    """
    matched = set()
    spurious = 0
    for t in det_times:
        hit = None
        for i, start in enumerate(event_starts):
            if start <= t <= start + span:
                hit = i
                break
        if hit is None:
            spurious += 1
        else:
            matched.add(hit)
    return matched, spurious


def _scenario_signals(seed: int, minutes: float):
    """The behavioral scenarios (reference protocol:
    IMPROVEMENT_PLAN.md:199-216): (silence, speech, (coughs, starts),
    confusables). Shared by --behavioral (single-threshold check) and
    --calibrate (threshold sweep).

    The speech scenario is VOICED (r3 VERDICT #5): pitch-contoured
    harmonic syllables under formant resonances with fricatives and
    plosive onsets (data/synth.synthetic_speech), interleaved with the
    legacy AM band-limited babble — the old babble-only proxy had no
    harmonics, formants or transients, so the <1 FP/min target was only
    as meaningful as noise. `confusables` is a fourth scenario of
    cough-CONFUSABLE negatives — laugh burst trains and throat clears
    (synth.synthetic_laugh / synthetic_throat_clear) — the signals that
    could plausibly fool the model; its FP/min is reported alongside the
    reference's three targets."""
    import numpy as np

    from ..data import synth
    from ..data.audio_io import resample_np

    sr = 16000
    seconds = int(minutes * 60)
    rng = np.random.default_rng(seed)

    def salted(k: int) -> int:
        # Scenario clips must NEVER replay training waveforms: the
        # training corpus draws the same generators at seeds
        # (corpus_seed + i) for coughs and (corpus_seed + 1000 + i) for
        # negatives, and the default workflow uses corpus_seed=0 AND
        # --seed 0 here — without a salt the detection scenario would
        # literally be training clips (memorization, not behavior).
        # SeedSequence spreads (seed, salt, k) into a disjoint space.
        return int(
            np.random.SeedSequence([seed, 0xE7A1BE, k]).generate_state(1)[0]
        )

    # Scenario 1: silence (target: 0 FP/min, IMPROVEMENT_PLAN.md:320)
    silence = (rng.standard_normal(seconds * sr) * 1e-4).astype(np.float32)

    # Scenario 2: speech (target <1 FP/min, :321) — voiced synthetic
    # speech clips with a legacy AM-babble segment every 4th slot.
    speech = (rng.standard_normal(seconds * sr) * 1e-4).astype(np.float32)
    pos, k = 0, 0
    while pos < seconds * sr:
        if k % 4 == 3:  # legacy babble segment (band-limited AM noise)
            dur = 3 * sr
            t = np.arange(dur) / sr
            envelope = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
            carrier = rng.standard_normal(dur).astype(np.float32)
            band = resample_np(
                resample_np(carrier[None], sr, 8000), 8000, sr
            )[0][:dur]
            seg = (envelope[: len(band)] * band * 0.1).astype(np.float32)
        else:
            seg = synth.synthetic_speech(salted(k), 3.0)
        end = min(pos + len(seg), seconds * sr)
        speech[pos:end] += seg[: end - pos]
        pos = end + int(0.3 * sr)
        k += 1

    # Scenario 3: coughs every ~5 s (target >80% detection, :322).
    n_coughs = seconds // 5
    coughs = (rng.standard_normal(seconds * sr) * 1e-3).astype(np.float32)
    starts = []
    for i in range(n_coughs):
        c = synth.synthetic_cough(salted(1_000 + i), 2.0)
        start = i * 5 * sr
        coughs[start : start + len(c)] += c
        starts.append(start / sr)

    # Scenario 4: cough-confusables — laughs and throat clears every ~4 s.
    confusables = (rng.standard_normal(seconds * sr) * 1e-4).astype(
        np.float32
    )
    pos, k = 0, 0
    while pos + 2 * sr <= seconds * sr:
        gen = (
            synth.synthetic_laugh if k % 2 == 0
            else synth.synthetic_throat_clear
        )
        seg = gen(salted(2_000 + k), 2.0)
        confusables[pos : pos + len(seg)] += seg
        pos += len(seg) + 2 * sr
        k += 1
    return silence, speech, (coughs, starts), confusables


def _behavioral_eval(args) -> None:
    from ..stream import StreamingDetector

    det = StreamingDetector(
        args.model, num_streams=1, chunk_size=1600,
        confidence_threshold=args.threshold, smoothing_window=3,
        debounce_seconds=0.5,
    )
    silence, speech, (signal, starts), confusables = _scenario_signals(
        args.seed, args.minutes
    )
    n_coughs = len(starts)

    def run(sig) -> int:
        det.reset()
        return len(det.process_chunk(sig[None, :]))

    fp_silence = run(silence) / args.minutes
    fp_speech = run(speech) / args.minutes
    fp_confusables = run(confusables) / args.minutes

    # Detections are MATCHED to the known insertion windows — a
    # double-fire on one cough can't mask a miss elsewhere, and off-window
    # fires count as spurious, not as detections (match_detections).
    det.reset()
    events = det.process_chunk(signal[None, :])
    matched, spurious = match_detections(
        [d.time_seconds for d in events], starts
    )
    detection_rate = len(matched) / max(n_coughs, 1)

    print(
        json.dumps(
            {
                "fp_per_min_silence": fp_silence,
                "fp_per_min_speech": fp_speech,
                "fp_per_min_confusables": fp_confusables,
                "cough_detection_rate": detection_rate,
                "coughs_matched": len(matched),
                "coughs_missed": n_coughs - len(matched),
                "spurious_detections": spurious,
                "targets": {
                    "fp_per_min_silence": 0.0,
                    "fp_per_min_speech": "<1",
                    "fp_per_min_confusables": "<1 (extended target: "
                                              "laughs + throat clears)",
                    "cough_detection_rate": ">0.8",
                },
            }
        )
    )


def _replay_events(smoothed, thr, debounce_windows, hop, window, sr):
    """Replay the engine's fire rule over a smoothed-confidence series:
    window i fires iff smoothed[i] >= thr and i - last_fire >=
    debounce_windows (stream/ring.py step 4, integer-window arithmetic).
    Returns event times in seconds."""
    times = []
    last = -(1 << 24)
    for i, s in enumerate(smoothed):
        if s >= thr and i - last >= debounce_windows:
            last = i
            times.append((i * hop + window) / sr)
    return times


def _calibrate(args) -> None:
    """Threshold calibration: operationalize the reference's manual
    'threshold tuning' step (IMPROVEMENT_PLAN.md:210-216). Scores each
    behavioral scenario ONCE (confidences are threshold-independent),
    then replays the engine's threshold+debounce rule across a sweep and
    reports the operating band meeting all three targets — 0 FP/min on
    silence, <1 FP/min on speech, >80 % matched detection — plus a
    recommended threshold (the passing band's midpoint). A self-check
    asserts the replay reproduces the live engine's event count at
    --threshold before any sweep number is trusted."""
    import numpy as np

    from ..stream import StreamingDetector

    det = StreamingDetector(
        args.model, num_streams=1, chunk_size=1600,
        confidence_threshold=args.threshold, smoothing_window=3,
        debounce_seconds=0.5,
    )
    sr = det.config.features.sample_rate
    window = det.window_samples
    hop = int(sr * det.stream_config.hop_duration)
    W = det.stream_config.smoothing_window
    debounce_windows = -(-int(round(0.5 * sr)) // hop)

    silence, speech, (coughs, starts), confusables = _scenario_signals(
        args.seed, args.minutes
    )
    n_coughs = len(starts)

    def smoothed_series(signal):
        n_win = (len(signal) - window) // hop + 1
        wins = np.stack(
            [signal[i * hop : i * hop + window] for i in range(n_win)]
        )
        probs = np.concatenate([
            det.scores_for(wins[i : i + 256])
            for i in range(0, n_win, 256)
        ])
        # Trailing mean over the last min(i+1, W) windows — the per-lane
        # deque semantics of stream/ring.py step 3.
        return np.array([
            probs[max(0, i - W + 1) : i + 1].mean() for i in range(n_win)
        ])

    series = {
        "silence": smoothed_series(silence),
        "speech": smoothed_series(speech),
        "coughs": smoothed_series(coughs),
        "confusables": smoothed_series(confusables),
    }

    # Self-check: the replay must reproduce the LIVE engine at the CLI
    # threshold on every scenario before any sweep number is trusted.
    for name, sig in (
        ("silence", silence), ("speech", speech), ("coughs", coughs),
        ("confusables", confusables),
    ):
        det.reset()
        live = det.process_chunk(sig[None, :])
        replayed = _replay_events(
            series[name], args.threshold, debounce_windows, hop, window, sr
        )
        if len(live) != len(replayed):
            # A hard error, not `assert`: under `python -O` asserts are
            # stripped and the sweep would print a "self_check" line for
            # a validation that never ran.
            raise SystemExit(
                f"replay self-check failed on {name}: engine {len(live)} "
                f"events vs replay {len(replayed)}"
            )

    sweep = []
    step = args.grid_step
    grid = np.round(np.arange(0.05, 0.99 + step / 2, step), 2)
    for thr in grid[grid <= 0.99]:
        fp_sil = len(_replay_events(
            series["silence"], thr, debounce_windows, hop, window, sr
        )) / args.minutes
        fp_sp = len(_replay_events(
            series["speech"], thr, debounce_windows, hop, window, sr
        )) / args.minutes
        fp_conf = len(_replay_events(
            series["confusables"], thr, debounce_windows, hop, window, sr
        )) / args.minutes
        matched, spurious = match_detections(
            _replay_events(
                series["coughs"], thr, debounce_windows, hop, window, sr
            ),
            starts,
        )
        rate = len(matched) / max(n_coughs, 1)
        sweep.append({
            "threshold": float(thr),
            "fp_per_min_silence": fp_sil,
            "fp_per_min_speech": fp_sp,
            "fp_per_min_confusables": fp_conf,
            "cough_detection_rate": rate,
            "spurious_on_coughs": spurious,
            # The reference's three targets (IMPROVEMENT_PLAN.md:316-324).
            "passes": bool(fp_sil == 0.0 and fp_sp < 1.0 and rate > 0.8),
            # Extended: also rejects the cough-confusable negatives.
            "passes_strict": bool(
                fp_sil == 0.0 and fp_sp < 1.0 and fp_conf < 1.0
                and rate > 0.8
            ),
        })

    def _band(key):
        passing = [r["threshold"] for r in sweep if r[key]]
        return [min(passing), max(passing)] if passing else None

    band = _band("passes")
    strict_band = _band("passes_strict")
    recommended = (
        round((band[0] + band[1]) / 2, 2) if band is not None else None
    )
    print(json.dumps({
        "sweep": sweep,
        "passing_band": band,
        "passing_band_strict": strict_band,
        "recommended_threshold": recommended,
        "self_check": "replay == live engine at "
                      f"threshold {args.threshold}",
        "targets": {
            "fp_per_min_silence": 0.0,
            "fp_per_min_speech": "<1",
            "fp_per_min_confusables": "<1 (strict band only)",
            "cough_detection_rate": ">0.8",
        },
    }))


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.calibrate:
        _calibrate(args)
    elif args.behavioral:
        _behavioral_eval(args)
    else:
        if not args.data_dir:
            raise SystemExit("--data-dir required (or use --behavioral)")
        _dataset_eval(args)


if __name__ == "__main__":
    main()
