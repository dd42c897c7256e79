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

    # One directory scan, two views: rebuilding CoughDataset per split
    # would re-walk the class directories (slow on network mounts) just
    # to overwrite its samples.
    def view(idx) -> CoughDataset:
        ds = CoughDataset.__new__(CoughDataset)
        ds.data_dir = full.data_dir
        ClipDataset.__init__(ds, [full.samples[i] for i in idx])
        return ds

    return view(train_idx), view(val_idx)


# ---------------------------------------------------------------------------
# Batched loader: host I/O threads → prefetched dense waveform batches
# ---------------------------------------------------------------------------


def _crop_window(
    wave: np.ndarray, segment_samples: int, shift: int = 0
) -> np.ndarray:
    """Center pad/trim a full clip to segment length, optionally with the
    window displaced by `shift` samples.

    shift=0 reproduces the reference's center pad_or_trim
    (reference: src/preprocessing.py:358-385). A nonzero shift reproduces
    the reference's full-clip time_shift-then-center-trim: shifting the
    whole waveform by +a and center-trimming equals cropping the window at
    center-a, with zero fill where the window leaves the clip
    (reference: src/augmentation.py:95-104 then src/dataset.py:156-160) —
    so shifted-in content is real adjacent audio, not synthetic silence,
    exactly as reference training sees it.
    """
    n = wave.shape[0]
    # final[j] = x[c + j - shift] iff BOTH the destination index (c + j,
    # the position inside the clip-length array the reference shifts
    # within) and the source index (c + j - shift) lie inside [0, n) —
    # for clips shorter than the segment the reference's shift drops
    # content at the clip edge before padding.
    #
    # c truncates toward ZERO, not floor: the reference pad branch puts
    # pad//2 zeros on the LEFT (left = floor(pad/2), src/preprocessing.py
    # :358-385 — same as ops.frontend.pad_or_trim), so for n < segment
    # the window origin is -(pad//2) = -((segment-n)//2). Floor division
    # of the signed difference would round the other way on odd pads and
    # place every short clip one sample right of where the reference
    # (and the serving front end) put it.
    if n >= segment_samples:
        c = (n - segment_samples) // 2
    else:
        c = -((segment_samples - n) // 2)
    out = np.zeros(segment_samples, np.float32)
    j_lo = max(-c, shift - c, 0)
    j_hi = min(n - c, n - c + shift, segment_samples)
    if j_hi > j_lo:
        src = c - shift
        out[j_lo:j_hi] = wave[src + j_lo : src + j_hi]
    return out


class _EpochKeyedLoader:
    """Epoch-keyed determinism + bounded background prefetch — the single
    owner of the machinery both batch loaders share (`BatchLoader` below
    and `ShardLoader` in data/shards.py), so the resume-replay contract
    can never silently diverge between the decode-fed and shard-fed paths.

    Epoch k's sample order (and any RNG draws a subclass makes downstream,
    e.g. crop shifts) derive from (seed, k) only — never from how many
    epochs ran before — so a resumed run replays bit-exact. Iteration
    produces batches on a daemon thread behind a bounded queue; abandoned
    iterators (consumer exception/break) release the producer instead of
    leaking it.

    Subclass contract: __init__ must set batch_size / shuffle / weighted /
    drop_last / prefetch / _seed / _epoch=0 / _pinned=False, and the class
    must define `_n_samples()` (corpus size), `_order_weights()` (weights
    for weighted sampling), `_producer_scope()` (context manager whose
    value is handed to each batch build — a thread pool, or a null
    context) and `_batch_at(idxs, scope, rng)` (build one batch).
    """

    # Multi-host input sharding (None = build full global batches).
    _local_rows = None
    # Host-side work counter: real rows materialized by this loader
    # (decoded/cropped or shard-gathered). Under multi-host local slicing
    # the per-rank counts sum to the single-process total — the probe
    # tests/test_distributed.py uses to prove each rank does 1/P of the
    # input work.
    rows_built = 0

    def set_process_slice(self, lo: int, hi: int, pad_to: int) -> None:
        """Restrict batch BUILDING to global rows [lo, hi) of each batch
        padded to `pad_to` rows — the rows this process's addressable
        devices hold under batch sharding (SURVEY.md §2.9 "sharded
        host-to-device pipeline"). The epoch order, and every RNG draw
        that shapes it (sampling, crop shifts), stays GLOBAL — all ranks
        compute the identical (seed, epoch) order and slice it — so
        metrics and trajectories are bit-identical to the global path
        while each rank decodes only its 1/P share. Batches then yield
        (local_waves, local_labels, n_global) instead of the global
        (waves, labels); the train loop assembles them into one global
        jax.Array via jax.make_array_from_process_local_data."""
        if not (0 <= lo <= hi <= pad_to):
            raise ValueError(f"bad process slice [{lo}, {hi}) of {pad_to}")
        self._local_rows = (int(lo), int(hi), int(pad_to))

    def _slice_bounds(self, n_global: int) -> Tuple[int, int]:
        """This rank's [s_lo, s_hi) clamped row range of an n_global
        batch (the tail batch can be shorter than the padded slice)."""
        lo, hi, _ = self._local_rows
        return min(lo, n_global), min(hi, n_global)

    def _pad_local(
        self, waves: np.ndarray, labels: np.ndarray, n_global: int
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Zero-fill this rank's real rows to its padded slice length.
        The (waves, labels, n_global) triple is the local-batch contract
        set_process_slice documents (n_global drives the step mask) —
        one implementation for the decode-fed and shard-fed loaders so
        the multi-host slicing rule can never diverge between them."""
        lo, hi, _ = self._local_rows
        w_out = np.zeros((hi - lo, waves.shape[1]), waves.dtype)
        l_out = np.zeros(hi - lo, np.int32)
        w_out[: waves.shape[0]] = waves
        l_out[: waves.shape[0]] = labels
        return w_out, l_out, n_global

    def __len__(self) -> int:
        n = self._n_samples()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch the next iteration draws its order/shifts for.
        Called by the train loop each epoch; resume at epoch k then replays
        exactly the order an uninterrupted run saw at epoch k.

        Pinning is sticky: once any caller pins, the loader stops
        auto-advancing on iterator close — the two mechanisms never mix,
        so a pinned consumer that breaks out of an epoch mid-way sees
        exactly the epoch it pinned on the next pass."""
        self._epoch = int(epoch)
        self._pinned = True

    def _epoch_rng(self) -> np.random.Generator:
        return np.random.default_rng([self._seed, self._epoch])

    def _epoch_order(self, rng: np.random.Generator) -> np.ndarray:
        n = self._n_samples()
        if self.weighted:
            w = self._order_weights()
            return rng.choice(n, size=n, replace=True, p=w / w.sum())
        idx = np.arange(n)
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = self._epoch_rng()
        order = self._epoch_order(rng)
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        abandoned = threading.Event()

        def put(item) -> bool:
            # Bounded-queue put that gives up if the consumer went away —
            # otherwise an abandoned iterator (e.g. an exception in the
            # training loop) leaves this thread blocked forever.
            while not abandoned.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:  # surface batch-build errors, never hang
                with self._producer_scope() as scope:
                    for b in range(n_batches):
                        idxs = order[
                            b * self.batch_size : (b + 1) * self.batch_size
                        ]
                        if not put(self._batch_at(idxs, scope, rng)):
                            return
            except BaseException as e:
                put(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Generator closed early (consumer exception/break): release the
            # producer so its thread pool and prefetched batches don't leak.
            abandoned.set()
            thread.join(timeout=5.0)
            # Auto-advance so callers that never set_epoch still see a
            # fresh order each bare pass. Pinned loaders (set_epoch — the
            # train loop) never auto-advance: mixing both would hand a
            # consumer that breaks mid-epoch a surprise order next pass.
            if not self._pinned:
                self._epoch += 1


class BatchLoader(_EpochKeyedLoader):
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
        time_shift_limit: float = 0.0,
        time_shift_prob: float = 0.0,
        cache_bytes: int = 2 << 30,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.cfg = feature_config
        self.shuffle = shuffle
        self.weighted = weighted
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        # time-shift augmentation happens at crop time, against the FULL
        # decoded clip (reference semantics — see _crop_window); device-side
        # time_shift would only see the pre-cropped 1 s window.
        self.time_shift_limit = time_shift_limit
        self.time_shift_prob = time_shift_prob
        # Epoch-keyed RNG: sample order and crop-shift draws for epoch k
        # depend only on (seed, k), never on how many epochs ran before —
        # so a resumed run replays the identical sample/augmentation stream
        # (the reference's mutating-RNG resume nondeterminism, fixed).
        self._seed = seed
        self._epoch = 0
        self._pinned = False
        # Bounded LRU over full decoded clips (cache_bytes=0 disables).
        import collections

        self._cache: "collections.OrderedDict[str, np.ndarray]" = (
            collections.OrderedDict()
        )
        self._cache_bytes = cache_bytes
        self._cache_used = 0
        self._cache_lock = threading.Lock()

        # Native (C++) decode path: threaded WAV decode+resample without the
        # GIL (crop-time shift augmentation included). "auto" uses it when
        # the toolchain built it and every sample is a .wav.
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

    def _n_samples(self) -> int:
        return len(self.dataset)

    def _order_weights(self) -> np.ndarray:
        return self.dataset.sample_weights

    def _producer_scope(self):
        return concurrent.futures.ThreadPoolExecutor(self.num_workers)

    def _batch_at(self, idxs, scope, rng):
        return self._make_batch(idxs, scope, rng)

    def _load_full(self, path: str) -> np.ndarray:
        with self._cache_lock:
            hit = self._cache.get(path)
            if hit is not None:
                self._cache.move_to_end(path)
                return hit
        clip = audio_io.load_mono_16k(path, self.cfg.sample_rate).astype(
            np.float32
        )
        if self._cache_bytes > 0:
            with self._cache_lock:
                # Re-check under the lock: duplicate indices (weighted
                # sampling with replacement) decode concurrently, and a
                # blind insert would double-count _cache_used forever.
                if path not in self._cache:
                    self._cache[path] = clip
                    self._cache_used += clip.nbytes
                while self._cache_used > self._cache_bytes and self._cache:
                    _, evicted = self._cache.popitem(last=False)
                    self._cache_used -= evicted.nbytes
        return clip

    def _shifts_for(self, n: int, rng: np.random.Generator) -> np.ndarray:
        if self.time_shift_prob <= 0.0 or self.time_shift_limit <= 0.0:
            return np.zeros(n)
        apply = rng.uniform(size=n) <= self.time_shift_prob
        # Shift magnitude is relative to each clip's FULL length (reference
        # semantics); resolved per clip at crop time via the limit fraction.
        frac = rng.uniform(
            -self.time_shift_limit, self.time_shift_limit, size=n
        )
        return np.where(apply, frac, 0.0)

    def _make_batch(
        self, idxs: np.ndarray, pool, rng: np.random.Generator
    ) -> Tuple[np.ndarray, ...]:
        paths = [self.dataset.samples[i][0] for i in idxs]
        labels = np.asarray(
            [self.dataset.samples[i][1] for i in idxs], np.int32
        )
        # Crop-shift draws are ALWAYS full-batch-shaped, before any
        # process slicing: the RNG stream is part of the (seed, epoch)
        # determinism contract, so a rank building 1/P of the rows must
        # consume exactly the draws the global path would.
        fracs = self._shifts_for(len(paths), rng)

        n_global = len(idxs)
        if self._local_rows is not None:
            s_lo, s_hi = self._slice_bounds(n_global)
            paths = paths[s_lo:s_hi]
            fracs = fracs[s_lo:s_hi]

        self.rows_built += len(paths)
        if self._native:
            from . import audio_io, native_loader

            if paths:
                waves, n_ok, errors = native_loader.load_batch(
                    paths, self.cfg.segment_samples, self.cfg.sample_rate,
                    n_threads=self.num_workers,
                    shift_fracs=fracs if np.any(fracs) else None,
                )
                if n_ok < len(paths):  # fail hard, like the python path
                    raise audio_io.AudioDecodeError(
                        f"{len(paths) - n_ok} clip(s) failed to decode: "
                        f"{errors}"
                    )
            else:
                waves = np.zeros(
                    (0, self.cfg.segment_samples), np.float32
                )
        else:
            def load_one(args):
                path, frac = args
                clip = self._load_full(path)
                shift = int(round(float(frac) * clip.shape[0]))
                return _crop_window(clip, self.cfg.segment_samples, shift)

            loaded = list(pool.map(load_one, zip(paths, fracs)))
            waves = (
                np.stack(loaded) if loaded
                else np.zeros((0, self.cfg.segment_samples), np.float32)
            )

        if self._local_rows is None:
            return waves, labels
        # Local-slice mode: zero-fill to this rank's padded slice length
        # and report the batch's global real-row count for masking.
        return self._pad_local(waves, labels[s_lo:s_hi], n_global)


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
