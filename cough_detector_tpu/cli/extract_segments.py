"""Segment extraction from long recordings — the curation tool the
reference proposed but never wrote (reference: IMPROVEMENT_PLAN.md:222-251
extract_cough_segments.py; :253-267 prepare_speech_data.py).

Two modes over a directory of long recordings:

  --mode energy   find high-energy bursts (short-time RMS above a dB
                  threshold relative to the clip's peak, with a minimum
                  duration), cut one segment-length window around each —
                  the cough-segment extractor sketch.
  --mode uniform  tile every file into consecutive segment-length clips —
                  the speech-data preparer sketch (feed it LibriSpeech-style
                  long speech and it emits 1 s negatives).

Optionally score every candidate with a trained model in one device batch
(--model + --min-confidence / --max-confidence) so curation can keep only
cough-like (or only cough-free) segments — the triage the reference's
trained-on-zeros postmortem asked for.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Extract training segments from long recordings"
    )
    p.add_argument("--input-dir", type=str, required=True,
                   help="Directory of long .wav recordings")
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--mode", choices=["energy", "uniform"], default="energy")
    p.add_argument("--threshold-db", type=float, default=-30.0,
                   help="Energy gate relative to the recording's peak frame")
    p.add_argument("--min-duration", type=float, default=0.1,
                   help="Minimum burst length in seconds (energy mode)")
    p.add_argument("--segment-duration", type=float, default=1.0)
    p.add_argument("--model", type=str, default=None,
                   help="Optional checkpoint to score candidates")
    p.add_argument("--min-confidence", type=float, default=None,
                   help="Keep only segments the model scores at/above this")
    p.add_argument("--max-confidence", type=float, default=None,
                   help="Keep only segments the model scores at/below this")
    p.add_argument("--prefix", type=str, default="seg")
    return p


def find_energy_bursts(
    wave,
    sample_rate: int,
    threshold_db: float = -30.0,
    min_duration: float = 0.1,
    frame_s: float = 0.025,
    hop_s: float = 0.010,
):
    """[(start_sample, end_sample)] of contiguous frames whose RMS is within
    `threshold_db` of the loudest frame. Pure numpy — this is host-side
    curation over arbitrary-length files, not a hot path."""
    import numpy as np

    frame = max(1, int(sample_rate * frame_s))
    hop = max(1, int(sample_rate * hop_s))
    n = (len(wave) - frame) // hop + 1
    if n <= 0:
        return []
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(np.asarray(wave)[idx] ** 2, axis=1) + 1e-12)
    db = 20.0 * np.log10(rms + 1e-12)
    gate = db >= (db.max() + threshold_db)

    bursts = []
    start = None
    for i, hot in enumerate(gate):
        if hot and start is None:
            start = i
        elif not hot and start is not None:
            bursts.append((start, i))
            start = None
    if start is not None:
        bursts.append((start, n))

    min_frames = max(1, int(round(min_duration / hop_s)))
    return [
        (s * hop, e * hop + frame)
        for s, e in bursts
        if e - s >= min_frames
    ]


def _cut(wave, center: int, seg: int):
    import numpy as np

    out = np.zeros(seg, np.float32)
    lo = max(0, center - seg // 2)
    hi = min(len(wave), lo + seg)
    out[: hi - lo] = wave[lo:hi]
    return out


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import numpy as np

    from ..config import FeatureConfig
    from ..data import audio_io

    cfg = FeatureConfig(segment_duration=args.segment_duration)
    sr = cfg.sample_rate
    seg = cfg.segment_samples
    in_dir = Path(args.input_dir)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    files = sorted(
        f for f in in_dir.rglob("*")
        if f.suffix.lower() in audio_io.AUDIO_EXTENSIONS
    )
    if not files:
        raise SystemExit(f"No recordings under {args.input_dir}")

    candidates = []  # (source stem, ordinal, segment wave)
    for f in files:
        wave = audio_io.load_mono_16k(str(f), sr).astype(np.float32)
        if args.mode == "uniform":
            spans = [
                (lo, min(lo + seg, len(wave)))
                for lo in range(0, max(len(wave) - seg + 1, 1), seg)
            ]
        else:
            spans = find_energy_bursts(
                wave, sr, args.threshold_db, args.min_duration
            )
        for i, (lo, hi) in enumerate(spans):
            candidates.append((f.stem, i, _cut(wave, (lo + hi) // 2, seg)))

    kept = candidates
    scores = None
    if args.model is not None and candidates:
        import jax.numpy as jnp

        from ..models import create_model
        from ..ops import frontend
        from ..stream.detector import _load_any_checkpoint

        variables, mcfg = _load_any_checkpoint(args.model)
        model = create_model(mcfg.model.model_type)
        batch = jnp.asarray(np.stack([w for _, _, w in candidates]))
        feats = frontend.extract_features_fast(
            frontend.peak_normalize(batch), mcfg.features
        )
        import jax

        probs = np.asarray(
            jax.nn.softmax(model.apply(variables, feats, train=False), -1)[:, 1]
        )
        scores = probs
        lo = args.min_confidence if args.min_confidence is not None else -1.0
        hi = args.max_confidence if args.max_confidence is not None else 2.0
        kept = [
            c for c, p in zip(candidates, probs) if lo <= float(p) <= hi
        ]

    for stem, i, wave in kept:
        audio_io.write_wav(
            out_dir / f"{args.prefix}_{stem}_{i:03d}.wav", wave, sr
        )

    print(
        json.dumps(
            {
                "recordings": len(files),
                "candidates": len(candidates),
                "written": len(kept),
                "mode": args.mode,
                "scored": scores is not None,
                "output": str(out_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
