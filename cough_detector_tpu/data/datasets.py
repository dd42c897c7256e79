"""Datasets and the batched host→device input pipeline.

Capability-parity rebuild of the reference data layer
(reference: src/dataset.py) with the architecture inverted: the reference
decodes, augments and featurizes one clip at a time inside DataLoader worker
processes (reference: src/dataset.py:121-173) — the biggest performance
bottleneck flagged in SURVEY.md §3.1. Here the host does only I/O (decode +
resample + fixed-length framing, thread-pooled and prefetched) and yields
dense (B, segment_samples) float32 batches; normalization, augmentation and
feature extraction run on device inside the jitted train step.

Class/label conventions match the reference exactly:
  classes = ['non_cough', 'cough'] → labels 0/1 (src/dataset.py:70-71)
  ESC-50 cough target 24, curated negatives, fold splits (src/dataset.py:176-296)
  inverse-frequency sample weights (src/dataset.py:109-116)
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import FeatureConfig
from . import audio_io

Sample = Tuple[str, int]

CLASSES = ["non_cough", "cough"]


class ClipDataset:
    """A list of (path, label) samples + class statistics."""

    def __init__(self, samples: Sequence[Sample]):
        self.samples = list(samples)
        self.class_counts = self._count_classes()
        self.sample_weights = self._compute_sample_weights()

    def _count_classes(self) -> Dict[int, int]:
        counts = {i: 0 for i in range(len(CLASSES))}
        for _, label in self.samples:
            counts[label] = counts.get(label, 0) + 1
        return counts

    def _compute_sample_weights(self) -> np.ndarray:
        """Inverse-frequency weights for balanced sampling
        (reference: src/dataset.py:109-116)."""
        total = len(self.samples)
        w = np.empty(total, np.float64)
        for i, (_, label) in enumerate(self.samples):
            w[i] = total / (len(CLASSES) * max(self.class_counts[label], 1))
        return w

    def __len__(self) -> int:
        return len(self.samples)


class CoughDataset(ClipDataset):
    """Directory-per-class dataset: data_dir/{cough,non_cough}/*.{wav,...}
    (reference: src/dataset.py:25-100)."""

    def __init__(self, data_dir: str):
        self.data_dir = Path(data_dir)
        samples: List[Sample] = []
        for label, class_name in enumerate(CLASSES):
            class_dir = self.data_dir / class_name
            if not class_dir.exists():
                print(f"Warning: Class directory {class_dir} not found")
                continue
            for f in sorted(class_dir.iterdir()):
                if f.suffix.lower() in audio_io.AUDIO_EXTENSIONS:
                    samples.append((str(f), label))
        super().__init__(samples)


class ESC50Dataset(ClipDataset):
    """ESC-50 handler: cough class 24 positive; curated or all-other-class
    negatives; 5-fold train/val splits (reference: src/dataset.py:176-264).
    """

    COUGH_CLASS = 24
    NEGATIVE_CLASSES = [20, 21, 22, 23, 25, 26, 38]

    def __init__(
        self,
        data_dir: str,
        is_training: bool = True,
        fold: Optional[int] = None,
        include_all_negatives: bool = True,
    ):
        import pandas as pd

        self.data_dir = Path(data_dir)
        meta_path = self.data_dir / "meta" / "esc50.csv"
        if not meta_path.exists():
            raise FileNotFoundError(f"ESC-50 metadata not found at {meta_path}")
        meta = pd.read_csv(meta_path)
        if fold is not None:
            meta = meta[meta["fold"] != fold] if is_training else meta[
                meta["fold"] == fold
            ]

        audio_dir = self.data_dir / "audio"
        samples: List[Sample] = []
        for _, row in meta.iterrows():
            path = audio_dir / row["filename"]
            if not path.exists():
                continue
            target = int(row["target"])
            if target == self.COUGH_CLASS:
                samples.append((str(path), 1))
            elif include_all_negatives or target in self.NEGATIVE_CLASSES:
                samples.append((str(path), 0))
        super().__init__(samples)


class CombinedDataset(ClipDataset):
    """Concatenation of datasets (reference: src/dataset.py:299-330)."""

    def __init__(self, datasets: Sequence[ClipDataset]):
        samples: List[Sample] = []
        for ds in datasets:
            samples.extend(ds.samples)
        super().__init__(samples)


def prepare_dataset_split(
    data_dir: str,
    val_split: float = 0.2,
    random_state: int = 42,
) -> Tuple[CoughDataset, CoughDataset]:
    """Stratified train/val split of one directory, seed 42 — identical
    selection semantics to the reference (src/dataset.py:421-483)."""
    from sklearn.model_selection import train_test_split

    full = CoughDataset(data_dir)
    indices = list(range(len(full)))
    labels = [full.samples[i][1] for i in indices]
    train_idx, val_idx = train_test_split(
        indices, test_size=val_split, random_state=random_state, stratify=labels
    )

    train_ds = CoughDataset(data_dir)
    train_ds.samples = [full.samples[i] for i in train_idx]
    train_ds.class_counts = train_ds._count_classes()
    train_ds.sample_weights = train_ds._compute_sample_weights()

    val_ds = CoughDataset(data_dir)
    val_ds.samples = [full.samples[i] for i in val_idx]
    val_ds.class_counts = val_ds._count_classes()
    val_ds.sample_weights = val_ds._compute_sample_weights()
    return train_ds, val_ds


# ---------------------------------------------------------------------------
# Batched loader: host I/O threads → prefetched dense waveform batches
# ---------------------------------------------------------------------------


def _load_clip(path: str, segment_samples: int, sample_rate: int) -> np.ndarray:
    """Decode+resample one clip and center pad/trim to segment length.

    Center framing here mirrors the reference's pad_or_trim
    (reference: src/preprocessing.py:358-385); peak-normalization happens on
    device so augmentation sees the un-normalized waveform, matching the
    reference's op order (src/dataset.py:150-163).
    """
    wave = audio_io.load_mono_16k(path, sample_rate)
    n = wave.shape[0]
    if n > segment_samples:
        start = (n - segment_samples) // 2
        wave = wave[start : start + segment_samples]
    elif n < segment_samples:
        pad = segment_samples - n
        left = pad // 2
        wave = np.pad(wave, (left, pad - left))
    return wave.astype(np.float32)


class BatchLoader:
    """Iterates (waves[B, segment], labels[B]) batches with thread-pooled
    decode and background prefetch.

    Weighted sampling with replacement reproduces the reference's
    WeightedRandomSampler + drop_last (reference: src/dataset.py:368-418).
    This is the host seam a native (C++) loader can later replace; the
    interface is just an iterator of dense numpy batches.
    """

    def __init__(
        self,
        dataset: ClipDataset,
        batch_size: int,
        feature_config: FeatureConfig = FeatureConfig(),
        shuffle: bool = False,
        weighted: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        backend: str = "auto",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.cfg = feature_config
        self.shuffle = shuffle
        self.weighted = weighted
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._cache: Dict[str, np.ndarray] = {}

        # Native (C++) decode path: threaded WAV decode+resample without the
        # GIL. "auto" uses it when the toolchain built it and every sample is
        # a .wav; numerics match the python path (shared resample spec).
        self._native = False
        if backend in ("auto", "native"):
            all_wav = all(
                p.lower().endswith(".wav") for p, _ in dataset.samples
            )
            if all_wav and len(dataset.samples) > 0:
                from . import native_loader

                if native_loader.available():
                    self._native = True
                elif backend == "native":
                    raise RuntimeError(
                        "native loader requested but unavailable"
                    )
            elif backend == "native":
                raise RuntimeError(
                    "native loader supports .wav datasets only"
                )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weighted:
            w = self.dataset.sample_weights
            return self._rng.choice(n, size=n, replace=True, p=w / w.sum())
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _load(self, path: str) -> np.ndarray:
        hit = self._cache.get(path)
        if hit is not None:
            return hit
        clip = _load_clip(path, self.cfg.segment_samples, self.cfg.sample_rate)
        self._cache[path] = clip
        return clip

    def _make_batch(self, idxs: np.ndarray, pool) -> Tuple[np.ndarray, np.ndarray]:
        paths = [self.dataset.samples[i][0] for i in idxs]
        labels = np.asarray(
            [self.dataset.samples[i][1] for i in idxs], np.int32
        )
        if self._native:
            from . import audio_io, native_loader

            waves, n_ok, errors = native_loader.load_batch(
                paths, self.cfg.segment_samples, self.cfg.sample_rate,
                n_threads=self.num_workers,
            )
            if n_ok < len(paths):  # fail hard, like the python path
                raise audio_io.AudioDecodeError(
                    f"{len(paths) - n_ok} clip(s) failed to decode: {errors}"
                )
            return waves, labels
        waves = np.stack(list(pool.map(self._load, paths)))
        return waves, labels

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for b in range(n_batches):
                        idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                        out_q.put(self._make_batch(idxs, pool))
                except BaseException as e:  # surface decode errors, never hang
                    out_q.put(e)
                finally:
                    out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        thread.join()


def create_data_loaders(
    train_dataset: ClipDataset,
    val_dataset: ClipDataset,
    batch_size: int = 32,
    num_workers: int = 4,
    use_weighted_sampler: bool = True,
    feature_config: FeatureConfig = FeatureConfig(),
) -> Tuple[BatchLoader, BatchLoader]:
    """Reference-API loader factory (reference: src/dataset.py:368-418):
    weighted-with-replacement + drop_last training loader, sequential
    validation loader."""
    train_loader = BatchLoader(
        train_dataset, batch_size, feature_config,
        shuffle=not use_weighted_sampler,
        weighted=use_weighted_sampler, drop_last=True,
        num_workers=num_workers,
    )
    val_loader = BatchLoader(
        val_dataset, batch_size, feature_config, num_workers=num_workers
    )
    return train_loader, val_loader
