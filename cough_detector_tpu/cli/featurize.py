"""Batched offline featurization CLI — the "ingest at scale" path.

Replaces the reference's per-clip CPU featurization (the dominant cost in
its training loop, SURVEY.md §3.1) with dense device batches: directory of
clips → (N, H, T) feature shards in .npz, reporting clips/sec. This is
BASELINE configs 2-3 (ESC-50 / COUGHVID full-dataset featurization).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Batch-featurize a directory of audio clips on TPU"
    )
    p.add_argument("--data-dir", type=str, required=True,
                   help="Directory with cough/non_cough subdirs, or flat clips")
    p.add_argument("--output", type=str, required=True,
                   help="Output .npz path (features, labels, paths)")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-workers", type=int, default=16)
    p.add_argument("--augment", action="store_true",
                   help="Apply the training augmentation chain on device")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..augment import augment_waveforms
    from ..config import FeatureConfig
    from ..data import audio_io
    from ..data.datasets import BatchLoader, ClipDataset, CoughDataset
    from ..ops import frontend
    from ..utils.observability import Throughput

    cfg = FeatureConfig()
    root = Path(args.data_dir)
    if (root / "cough").exists() or (root / "non_cough").exists():
        dataset = CoughDataset(str(root))
    else:
        clips = [
            (str(f), -1)
            for f in sorted(root.rglob("*"))
            if f.suffix.lower() in audio_io.AUDIO_EXTENSIONS
        ]
        dataset = ClipDataset(clips)
    if len(dataset) == 0:
        raise SystemExit(f"No audio clips found under {args.data_dir}")

    loader = BatchLoader(
        dataset, args.batch_size, cfg, num_workers=args.num_workers
    )

    # Ingest-at-scale sharding (SURVEY.md §2.9): with N devices the batch
    # axis splits over the mesh — each chip featurizes its shard, no
    # collectives needed (features are per-clip).
    from ..parallel import batch_sharding, make_mesh, pad_to_multiple

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    n_dev = mesh.devices.size if mesh is not None else 1
    data_sh = batch_sharding(mesh) if mesh is not None else None

    @jax.jit
    def featurize(waves, key):
        waves = frontend.peak_normalize(waves)
        if args.augment:
            waves = augment_waveforms(
                waves, key, p=0.3, sample_rate=cfg.sample_rate
            )
        # Fused Pallas kernel on TPU (hybrid for contrast configs), jnp
        # chain on CPU — same outputs, ~3x faster ingest on the chip.
        return frontend.extract_features_fast(waves, cfg)

    feats_out, labels_out = [], []
    # rbg PRNG: threefry normal draws cost ~18 ms per (512, 16000) on v5e
    # (same choice as the trainer, train/loop.py).
    key = jax.random.key(args.seed, impl="rbg")
    # Steady-state throughput (utils/observability.py): the first batch
    # carries the XLA compile (30 s-5 min over the dev tunnel), so the
    # warmup-discarding counter reports what a long ingest run sustains,
    # alongside the end-to-end clips_per_sec that includes it.
    steady = Throughput(warmup=1)
    t0 = time.perf_counter()
    n = 0
    for waves, labels in loader:
        steady.start()
        key, sub = jax.random.split(key)
        # Pad the tail batch to the FULL batch shape, not just a
        # device-count multiple: a shorter final batch is a distinct XLA
        # program, and a recompile over the tunneled chip costs
        # 30 s-5 min — dwarfing the wasted rows' compute.
        waves, real = pad_to_multiple(waves, args.batch_size)
        waves, _ = pad_to_multiple(waves, n_dev)
        dev_waves = (
            jax.device_put(waves, data_sh) if mesh is not None
            else jnp.asarray(waves)
        )
        f = featurize(dev_waves, sub)
        feats_out.append(np.asarray(f)[:real])
        labels_out.append(labels)
        steady.stop(real)
        n += real
    dt = time.perf_counter() - t0

    features = np.concatenate(feats_out)
    labels = np.concatenate(labels_out)
    np.savez_compressed(
        args.output,
        features=features,
        labels=labels,
        paths=np.asarray([p for p, _ in dataset.samples]),
    )
    print(
        json.dumps(
            {
                "clips": int(n),
                "feature_shape": list(features.shape[1:]),
                "seconds": round(dt, 3),
                "clips_per_sec": round(n / dt, 1),
                "steady_clips_per_sec": round(steady.items_per_sec, 1),
                "devices": n_dev,
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
