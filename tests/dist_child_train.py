"""Child process of the 2-process END-TO-END train() cluster test.

Unlike dist_child.py (which drives the bare train step), this runs the
production `train()` orchestration itself across the cluster: dataset
split, deterministic loaders, DP over the spanning mesh, metrics,
checkpoints (rank 0 only).

argv: data_dir out_dir [mode]
  mode (default "decode"):
    decode        — wav-decode BatchLoader path (per-rank input slices)
    scan          — packed shards + device-resident corpus: ONE fused
                    scanned XLA program per epoch, replicated corpus
                    (data_dir is a shards dir); synchronous Orbax saves
                    run their cross-process barrier each epoch
    scan-sharded  — same, with a tiny device_corpus_budget so the corpus
                    row-shards over BOTH processes and every scan step
                    runs the routed collective gather (all_gather →
                    owned-row gather → psum_scatter) across gloo
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from cough_detector_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed() is True
assert jax.process_count() == 2

from cough_detector_tpu.config import Config, ModelConfig, TrainConfig
from cough_detector_tpu.train import train

data_dir, out_dir = sys.argv[1], sys.argv[2]
mode = sys.argv[3] if len(sys.argv) > 3 else "decode"
cfg = Config(
    model=ModelConfig(model_type="small"),
    train=TrainConfig(batch_size=8, epochs=2, patience=50),
)
if mode == "decode":
    train(data_dir, out_dir, config=cfg, num_workers=2, use_esc50=False)
elif mode == "scan":
    train(None, out_dir, config=cfg, shards_dir=data_dir,
          device_corpus=True)
elif mode == "scan-sharded":
    train(None, out_dir, config=cfg, shards_dir=data_dir,
          device_corpus=True, device_corpus_budget=100_000)
else:
    raise SystemExit(f"unknown mode {mode!r}")
print(f"TRAIN_DONE rank={jax.process_index()}", flush=True)
