"""Pre-decoded waveform shards: pack once, train at device speed.

The reference decodes audio inside its DataLoader on every epoch
(reference: src/dataset.py:121-173); our BatchLoader moves that to host
threads + an LRU cache, but a cold or larger-than-cache corpus still pins
training at host-decode speed (SURVEY.md §7 hard part (e)). This module
removes decode from the epoch loop entirely:

  * `write_shards` packs a dataset into int16 RAW-WAVEFORM shards
    (decode + resample + center-crop happen ONCE, at pack time). Waves
    stay raw — not featurized — so the device-side augmentation chain and
    the fused feature kernel still apply per epoch, exactly as in the
    BatchLoader path.
  * `ShardLoader` is a drop-in `BatchLoader` sibling over a packed
    directory: same (waves, labels) batch iterator, same epoch-keyed
    determinism contract (epoch k's order derives from (seed, k) only, so
    resume replays bit-exact), same weighted/shuffle/drop_last semantics.
    Batches come from memory-mapped .npy files — a gather + memcpy, no
    decode — and are yielded as int16; dequantization (waves / 32768)
    runs ON DEVICE inside the train step, halving H2D bytes.

Layout (format version 2 — v2 moved the int16 scale from 32767 to
32768 so the decode→pack→load round trip is BIT-EXACT; v1 corpora fail
the version check loudly and must re-pack):

    <dir>/manifest.json                 counts, geometry, shard table
    <dir>/waves-00000.npy               int16 (N, segment_samples)
    <dir>/labels-00000.npy              int16 (N,)

.npy (not .npz): zip members can't be memory-mapped, and mmap is what
makes epoch reads free after the first pass (OS page cache).
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path
from typing import Tuple

import numpy as np

from ..config import FeatureConfig
from .datasets import _EpochKeyedLoader

MANIFEST = "manifest.json"
FORMAT_VERSION = 2
# 32768 — the DECODER's divisor (audio_io reads int16 as s/32768, as does
# native/cdt_loader.cpp) — NOT 32767: decoded WAV samples are exactly
# k/32768, so round(x*32768) recovers k and the pack→load round trip is
# bit-exact. A 32767 scale (format v1) perturbed every |k| >= 16385 by
# one LSB, silently breaking shard-fed vs decode-fed equivalence.
INT16_SCALE = 32768.0


def quantize(waves: np.ndarray) -> np.ndarray:
    """float32 PCM (≈[-1, 1]) → int16. WAV sources are int16 PCM to begin
    with (decoded as k/32768), so round-tripping through the decoder is
    bit-exact; inputs outside the int16 lattice round to the nearest
    code, with +1.0 clipping to 32767."""
    return np.clip(
        np.round(waves * INT16_SCALE), -32768, 32767
    ).astype(np.int16)


def dequantize(waves: np.ndarray) -> np.ndarray:
    return waves.astype(np.float32) * (1.0 / INT16_SCALE)


def dequantize_jnp(waves):
    """Device-side dequantization for jitted feature paths: int16 shard
    batches become f32 waveforms; anything already float passes through.
    The single owner of the scale contract — train and evaluate both
    call this rather than re-spelling the constant."""
    import jax.numpy as jnp

    if waves.dtype == jnp.int16:
        return waves.astype(jnp.float32) * (1.0 / INT16_SCALE)
    return waves


def write_shards(
    dataset,
    out_dir: str,
    feature_config: FeatureConfig = FeatureConfig(),
    shard_size: int = 8192,
    num_workers: int = 8,
    backend: str = "auto",
) -> dict:
    """Pack a ClipDataset into int16 waveform shards; returns the manifest.

    Decode order is the dataset's own (no shuffle): shard row r of the
    global index equals dataset.samples[r], so selection-order contracts
    (e.g. prepare_dataset_split's seeded split) survive packing.
    """
    from .datasets import BatchLoader

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    loader = BatchLoader(
        dataset, shard_size, feature_config,
        num_workers=num_workers, backend=backend, cache_bytes=0,
    )
    shards = []
    counts: dict = {}
    n_total = 0
    for i, (waves, labels) in enumerate(loader):
        np.save(out / f"waves-{i:05d}.npy", quantize(waves))
        np.save(out / f"labels-{i:05d}.npy", labels.astype(np.int16))
        shards.append({"file": f"waves-{i:05d}.npy", "n": int(len(labels))})
        for lab in labels:
            counts[int(lab)] = counts.get(int(lab), 0) + 1
        n_total += len(labels)
    manifest = {
        "version": FORMAT_VERSION,
        "segment_samples": int(feature_config.segment_samples),
        "sample_rate": int(feature_config.sample_rate),
        "n_clips": n_total,
        "class_counts": {str(k): v for k, v in sorted(counts.items())},
        "shards": shards,
    }
    (out / MANIFEST).write_text(json.dumps(manifest, indent=2))
    return manifest


class ShardLoader(_EpochKeyedLoader):
    """Iterates (waves[B, segment] int16, labels[B] int32) batches from a
    packed shard directory — the decode-free twin of `BatchLoader`.
    The epoch-keyed determinism, sampling and prefetch contracts are not
    merely identical but the SAME CODE (`_EpochKeyedLoader`); see
    `BatchLoader` for the reference mapping."""

    def __init__(
        self,
        shard_dir: str,
        batch_size: int,
        *,
        shuffle: bool = False,
        weighted: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 4,
        feature_config: "FeatureConfig" = None,
    ):
        self.shard_dir = Path(shard_dir)
        manifest_path = self.shard_dir / MANIFEST
        if not manifest_path.exists():
            raise FileNotFoundError(
                f"No shard manifest at {manifest_path} — pack with "
                f"`cdt-pack` (cli/pack.py) first"
            )
        self.manifest = json.loads(manifest_path.read_text())
        if self.manifest.get("version") != FORMAT_VERSION:
            raise ValueError(
                f"Shard format version "
                f"{self.manifest.get('version')!r} != {FORMAT_VERSION}"
            )
        self.segment_samples = int(self.manifest["segment_samples"])
        if feature_config is not None:
            # Geometry mismatches must be LOUD: a 22.05 kHz corpus fed to
            # a 16 kHz front end computes every feature on the wrong time
            # base with no numeric error anywhere downstream.
            want = (
                int(feature_config.sample_rate),
                int(feature_config.segment_samples),
            )
            got = (
                int(self.manifest["sample_rate"]),
                self.segment_samples,
            )
            if want != got:
                raise ValueError(
                    f"shard corpus geometry (sample_rate, segment)={got} "
                    f"does not match the run's feature config {want} — "
                    f"re-pack with cdt-pack under the right config"
                )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.weighted = weighted
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._seed = seed
        self._epoch = 0
        self._pinned = False

        self._waves = []
        labels = []
        sizes = []
        for entry in self.manifest["shards"]:
            w = np.load(self.shard_dir / entry["file"], mmap_mode="r")
            if w.shape[1] != self.segment_samples or w.dtype != np.int16:
                raise ValueError(
                    f"{entry['file']}: bad shape/dtype {w.shape} {w.dtype}"
                )
            lab_file = entry["file"].replace("waves-", "labels-")
            lab = np.load(self.shard_dir / lab_file)
            if len(lab) != w.shape[0] or w.shape[0] != entry["n"]:
                raise ValueError(f"{entry['file']}: row count mismatch")
            self._waves.append(w)
            labels.append(lab)
            sizes.append(w.shape[0])
        self._labels = (
            np.concatenate(labels).astype(np.int32)
            if labels else np.zeros(0, np.int32)
        )
        self._starts = np.concatenate([[0], np.cumsum(sizes)])
        self.class_counts = {
            int(k): int(v)
            for k, v in self.manifest.get("class_counts", {}).items()
        }
        self.sample_weights = self._compute_sample_weights()

    def _compute_sample_weights(self) -> np.ndarray:
        """Inverse-frequency weights, matching ClipDataset
        (reference: src/dataset.py:109-116). Vectorized — this loader
        targets corpora too large to decode per epoch, so a per-row
        Python loop here would cost seconds at every construction."""
        total = len(self._labels)
        n_classes = max(len(self.class_counts), 1)
        if total == 0:
            return np.empty(0, np.float64)
        counts = np.ones(int(self._labels.max()) + 1, np.float64)
        for k, v in self.class_counts.items():
            if 0 <= k < counts.shape[0]:
                counts[k] = max(v, 1)
        return total / (n_classes * counts[self._labels])

    def _n_samples(self) -> int:
        return len(self._labels)

    def _order_weights(self) -> np.ndarray:
        return self.sample_weights

    def _producer_scope(self):
        return contextlib.nullcontext()

    def _batch_at(self, idxs, scope, rng):
        if self._local_rows is None:
            self.rows_built += len(idxs)
            return self._gather(idxs)
        # Multi-host local slicing (set_process_slice): gather only this
        # rank's rows of the padded batch; see _EpochKeyedLoader.
        n_global = len(idxs)
        s_lo, s_hi = self._slice_bounds(n_global)
        waves, labels = self._gather(idxs[s_lo:s_hi])
        self.rows_built += s_hi - s_lo
        return self._pad_local(waves, labels, n_global)

    @property
    def n_clips(self) -> int:
        return len(self._labels)

    def corpus_nbytes(self) -> int:
        return sum(w.nbytes for w in self._waves)

    def corpus(self) -> np.ndarray:
        """The full (N, segment) int16 corpus, materialized — the upload
        payload for device-resident training (train/steps.py epoch-scan
        programs)."""
        if not self._waves:
            return np.zeros((0, self.segment_samples), np.int16)
        return np.concatenate([np.asarray(w) for w in self._waves])

    def corpus_rows(self, idxs: np.ndarray) -> np.ndarray:
        """int16 waveform rows for the given GLOBAL clip indices, served
        from the mmap'd shards — the window-buffer fetch for CHUNKED
        device-corpus training (train/loop.py), where only the rows a
        window's steps actually touch are uploaded."""
        return self._gather(np.asarray(idxs))[0]

    def epoch_batches(self, epoch: int):
        """(idx_mat, labels_mat, mask_mat), each (steps, B), defining this
        epoch's batches — the same order __iter__ would produce for the
        same epoch (one RNG, one contract), in index form so a scanned
        epoch can gather batches from a device-resident corpus. Tail
        batches (no drop_last) pad with index 0 rows masked out."""
        self.set_epoch(epoch)
        order = self._epoch_order(self._epoch_rng())
        n_steps = len(self)
        b = self.batch_size
        take = order[: n_steps * b]
        mask = np.ones(take.shape[0], np.float32)
        pad = n_steps * b - take.shape[0]
        if pad > 0:
            take = np.concatenate([take, np.zeros(pad, take.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        idx_mat = take.reshape(n_steps, b).astype(np.int32)
        labels_mat = self._labels[idx_mat]
        return idx_mat, labels_mat, mask.reshape(n_steps, b)

    def _gather(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        out = np.empty((len(idxs), self.segment_samples), np.int16)
        shard_ids = (
            np.searchsorted(self._starts, idxs, side="right") - 1
        )
        for s in np.unique(shard_ids):
            sel = shard_ids == s
            rows = idxs[sel] - self._starts[s]
            # mmap fancy-index: one read+memcpy per selected row, served
            # from the page cache after the first epoch.
            out[sel] = self._waves[s][rows]
        return out, self._labels[idxs]
