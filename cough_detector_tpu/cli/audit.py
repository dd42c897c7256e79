"""Dataset quality audit.

The reference sketches but never implements audit tooling
(reference: IMPROVEMENT_PLAN.md:220-283, the audit_data.py proposal that
followed its trained-on-zeros postmortem). This implements it: per-clip
health checks (decode failure, silence, clipping, duration, DC offset) plus
optional model-vs-label disagreement scoring, emitting a JSONL report and a
summary. Batched on device where it counts.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Audit a cough/non_cough dataset")
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--report", type=str, default="audit_report.jsonl")
    p.add_argument("--model", type=str, default=None,
                   help="Optional checkpoint: also flag label/model disagreements")
    p.add_argument("--silence-rms", type=float, default=1e-4,
                   help="RMS below this (post peak-normalize scale) = silent")
    p.add_argument("--clip-fraction", type=float, default=0.01,
                   help="Fraction of |x|>0.999 samples considered clipping")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-workers", type=int, default=8)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import numpy as np

    from ..config import FeatureConfig
    from ..data import audio_io
    from ..data.datasets import CoughDataset

    cfg = FeatureConfig()
    ds = CoughDataset(args.data_dir)
    if len(ds) == 0:
        raise SystemExit(f"No clips under {args.data_dir}")

    scorer = None
    if args.model:
        from ..stream.detector import StreamingDetector, _load_any_checkpoint

        variables, mcfg = _load_any_checkpoint(args.model)
        det = StreamingDetector(variables=variables, config=mcfg)
        scorer = det.scores_for
        # Crop/score on the CHECKPOINT's geometry, not the default: a
        # model trained at another segment length or rate would
        # otherwise be scored on mis-framed windows — every
        # label_disagreement count bogus with no error anywhere.
        cfg = mcfg.features

    report = Path(args.report).open("w")
    counts = {
        "total": len(ds), "decode_failed": 0, "silent": 0, "clipped": 0,
        "short": 0, "dc_offset": 0, "label_disagreement": 0, "healthy": 0,
    }

    batch_paths, batch_labels = [], []

    def flush():
        if not batch_paths:
            return
        waves = np.zeros((len(batch_paths), cfg.segment_samples), np.float32)
        flags = [[] for _ in batch_paths]
        durations = []
        for i, p in enumerate(batch_paths):
            try:
                mono = audio_io.load_mono_16k(p, cfg.sample_rate)
            except audio_io.AudioDecodeError as e:
                flags[i].append("decode_failed")
                counts["decode_failed"] += 1
                durations.append(0.0)
                continue
            durations.append(len(mono) / cfg.sample_rate)
            if len(mono) < cfg.sample_rate * 0.2:
                flags[i].append("short")
                counts["short"] += 1
            rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
            if rms < args.silence_rms:
                flags[i].append("silent")
                counts["silent"] += 1
            if len(mono) and np.mean(np.abs(mono) > 0.999) > args.clip_fraction:
                flags[i].append("clipped")
                counts["clipped"] += 1
            if len(mono) and abs(float(np.mean(mono))) > 0.05:
                flags[i].append("dc_offset")
                counts["dc_offset"] += 1
            n = min(len(mono), cfg.segment_samples)
            start = max(0, (len(mono) - n) // 2)
            waves[i, (cfg.segment_samples - n) // 2 :][:n] = mono[start : start + n]

        probs = scorer(waves) if scorer is not None else None
        for i, (p, label) in enumerate(zip(batch_paths, batch_labels)):
            rec = {
                "path": p, "label": label,
                "duration_s": round(durations[i], 3),
                "flags": flags[i],
            }
            if probs is not None and "decode_failed" not in flags[i]:
                p_cough = float(probs[i])
                rec["p_cough"] = round(p_cough, 4)
                if (label == 1) != (p_cough > 0.5):
                    rec["flags"] = flags[i] + ["label_disagreement"]
                    counts["label_disagreement"] += 1
            if not rec["flags"]:
                counts["healthy"] += 1
            report.write(json.dumps(rec) + "\n")
        batch_paths.clear()
        batch_labels.clear()

    for path, label in ds.samples:
        batch_paths.append(path)
        batch_labels.append(label)
        if len(batch_paths) >= args.batch_size:
            flush()
    flush()
    report.close()

    print(json.dumps(counts))
    print(f"Report: {args.report}")


if __name__ == "__main__":
    main()
