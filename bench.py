"""Headline benchmark: end-to-end 1 s clips/sec/chip (features + classifier).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: ≥10,000 clips/s/chip on TPU v5e (BASELINE.md north star) —
vs_baseline is measured/10,000. The timed region is the full serving
compute path: raw 16 kHz waveform batch → stacked (90, 101) features →
CoughDetectorResidual logits, all inside one jit program on one chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cough_detector_tpu.config import default_config
    from cough_detector_tpu.data import synth
    from cough_detector_tpu.models import create_model, init_model
    from cough_detector_tpu.ops import frontend

    cfg = default_config("residual")
    model = create_model(cfg.model.model_type)
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )

    @jax.jit
    def forward(waves):
        feats = frontend.extract_features_fast(waves, cfg.features)
        return model.apply(variables, feats, train=False)

    batch = 2048
    waves = jnp.asarray(synth.fixture_batch(batch, 1.0, seed=0))

    # Warmup / compile.
    forward(waves).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(waves)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    clips_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "1s_clips_per_sec_per_chip_end_to_end",
                "value": round(clips_per_sec, 1),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
