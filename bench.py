"""Headline benchmark: end-to-end 1 s clips/sec/chip (features + classifier).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: ≥10,000 clips/s/chip on TPU v5e (BASELINE.md north star) —
vs_baseline is measured/10,000. The timed region is the full serving
compute path: raw 16 kHz waveform batch → stacked (90, 101) features →
CoughDetectorResidual logits, all inside one jit program on one chip.

`--serving` runs the secondary multi-stream benchmark instead (BASELINE
config 5): 256 concurrent audio streams ticked with 100 ms chunks through
the jitted ring-buffer detector, reporting the sustained (pipelined) tick
time, the synchronous-tick p50 (host round-trip included), and the derived
real-time stream capacity.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def serving_bench(num_streams: int = 256, n_ticks: int = None,
                  precision_mode: str = "high") -> None:
    import jax

    from cough_detector_tpu.config import default_config
    from cough_detector_tpu.data import synth
    from cough_detector_tpu.models import create_model, init_model
    from cough_detector_tpu.stream import StreamingDetector

    cfg = default_config("residual")
    model = create_model(cfg.model.model_type)
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )
    chunk = 1600  # 100 ms at 16 kHz — the reference mic chunk
    if n_ticks is None:
        n_ticks = int(max(16, min(100, 64_000_000 // (num_streams * chunk))))
    # Cap the PREPARED audio at ~64M samples regardless of how many ticks
    # are timed (the old formula's 16-tick floor silently blew through the
    # cap at high stream counts): prepare a few unique tick tensors and
    # cycle them. Tick content doesn't affect timing — the state chain,
    # shapes and scoring work are identical every tick.
    n_unique = int(
        max(2, min(n_ticks, 64_000_000 // (num_streams * chunk)))
    )
    det = StreamingDetector(
        variables=variables, config=cfg, num_streams=num_streams,
        precision_mode=precision_mode,
        chunk_size=chunk, confidence_threshold=0.7, smoothing_window=3,
        debounce_seconds=0.5,
    )
    base = np.stack(
        [np.resize(synth.synthetic_cough(i, 2.0), chunk * n_unique)
         for i in range(min(num_streams, 256))]
    ).astype(np.float32)
    audio = np.tile(base, (-(-num_streams // base.shape[0]), 1))[:num_streams]

    import jax.numpy as jnp

    # Drive the jitted tick directly so syncing policy is explicit: in
    # production the host consumes detection events asynchronously, so
    # sustained capacity is measured pipelined (device-side ticks enqueue
    # back-to-back); the synchronous-tick latency — which over this dev
    # tunnel is dominated by host<->TPU round-trip, not compute — is
    # reported separately.
    step, state = det._step, det._state
    chunks = [
        jnp.asarray(audio[:, t * chunk : (t + 1) * chunk])
        for t in range(n_unique)
    ]
    state, ev = step(state, chunks[0])  # compile
    np.asarray(ev["fired"])  # fetch: wait for compile + first tick for real

    # Sustained (pipelined) throughput. Ticks are serially dependent
    # through `state`, so fetching the LAST tick's event (host fetch, not
    # block_until_ready — which can silently no-op over the axon tunnel)
    # provably waits for the whole chain.
    t0 = time.perf_counter()
    for t in range(1, n_ticks):
        state, ev = step(state, chunks[t % n_unique])
    float(np.asarray(ev["fired"]).sum())
    sustained_tick = (time.perf_counter() - t0) / (n_ticks - 1)

    # Synchronous per-tick latency (includes host round-trip). The step
    # donates its state argument, so thread it through.
    sync = []
    for t in range(12):
        t0 = time.perf_counter()
        state, ev = step(state, chunks[t % n_unique])
        np.asarray(ev["fired"])  # host fetch = provable completion
        sync.append(time.perf_counter() - t0)
    sync_p50 = float(np.percentile(sync, 50))

    # Real-time capacity AT THIS stream count: real-time iff a tick of
    # 100 ms audio processes in under 100 ms. The count itself is the
    # capacity evidence — no extrapolation from smaller batches.
    realtime = sustained_tick < 0.1
    capacity = int(num_streams * 0.1 / sustained_tick)
    print(
        json.dumps(
            {
                "metric": "multi_stream_serving",
                "num_streams": num_streams,
                "precision": precision_mode,
                "n_ticks_timed": n_ticks - 1,
                "sustained_tick_ms": round(sustained_tick * 1e3, 3),
                "sync_tick_p50_ms": round(sync_p50 * 1e3, 3),
                "realtime_at_this_count": realtime,
                "derived_stream_capacity_per_chip": capacity,
                "vs_baseline_256_streams": round(capacity / 256.0, 2),
            }
        ),
        flush=True,
    )


_CLIENT_BOOT = (
    "import sys; sys.path.insert(0, {repo!r}); "
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import bench; bench._daemon_client_main(sys.argv[1:])"
)


def _daemon_client_main(argv) -> None:
    """One load-generator child process (spawned by daemon_bench via a
    plain subprocess — no multiprocessing, so any caller context is
    safe): opens n_slots, prints READY, waits for GO on stdin, feeds one
    real-time 100 ms frame per slot per tick (absolute-deadline pacing),
    drains events on a thread, prints `EVENTS <n>` and exits. A separate
    interpreter so the harness's Python work never shares the GIL with
    the server under test."""
    import threading
    import time as _t

    from cough_detector_tpu.data import synth
    from cough_detector_tpu.serve.client import DetectionClient

    host, port, n_slots, n_frames, tick_s, chunk = (
        argv[0], int(argv[1]), int(argv[2]), int(argv[3]),
        float(argv[4]), int(argv[5]),
    )
    clip = np.resize(
        synth.synthetic_cough(3, 2.0), chunk * (n_frames + 1)
    ).astype(np.float32)
    client = DetectionClient(host, port)
    slots = [client.open_stream() for _ in range(n_slots)]
    done = threading.Event()
    got = [0]

    def drain():
        while not done.is_set():
            got[0] += len(client.events(timeout=0.2))
        got[0] += len(client.events())

    dt_ = threading.Thread(target=drain, daemon=True)
    dt_.start()
    print("READY", flush=True)
    sys.stdin.readline()  # GO
    t0 = _t.monotonic()
    next_t = t0 + tick_s
    for f in range(n_frames):
        delay = next_t - _t.monotonic()
        if delay > 0:
            _t.sleep(delay)
        next_t += tick_s
        lo = (f * chunk) % (clip.size - chunk)
        frame = clip[lo : lo + chunk]
        try:
            for sid in slots:
                client.send_audio(sid, frame)
        except OSError:
            break
    # How far behind the real-time schedule this generator finished: if
    # the CLIENT couldn't offer the load, the server row is void.
    late = _t.monotonic() - (t0 + n_frames * tick_s)
    _t.sleep(0.5)  # let the tail tick's events arrive
    done.set()
    dt_.join(timeout=2.0)
    print(f"EVENTS {got[0]} LATE {late:.3f}", flush=True)
    client.close()


def _ensure_loadgen():
    """Build native/cdt_loadgen (standalone binary) if missing or stale.
    Returns the binary path, or None if the toolchain isn't available."""
    import os
    import shutil
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "cdt_loadgen.cpp")
    out = os.path.join(here, "native", "cdt_loadgen")
    if shutil.which("g++") is None:
        return None
    # Staleness policy (strictly-newer mtime) and compiler invocation
    # live in utils/native_build.py, shared with both .so planes.
    from cough_detector_tpu.utils.native_build import build_native

    built = build_native(src, out, shared=False)
    return str(built) if built is not None else None


def _rss_kb() -> int:
    """Resident set size of this process in KiB (soak-run leak probe:
    the server's slot rings, delivery queues and C++ plane buffers are
    all bounded, so RSS must plateau over a long run)."""
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def daemon_bench(
    num_streams: int = 256,
    n_clients: int = 8,
    seconds: float = 30.0,
    chunk: int = 1600,
    backend: str = "python",
    loadgen: str = "python",
    h2d_dtype: str = "float32",
    uplink_s: float = None,
) -> dict:
    """Benchmark the SOCKET serving tier end-to-end (serve/server.py) —
    not the in-process engine: M loopback DetectionClient PROCESSES feed
    real-time 100 ms PCM frames across N stream slots of a timer-policy
    DetectionServer while its device tick runs on the chip. Clients are
    separate processes so the measured ceiling is the server's, not the
    harness's GIL. Reports the achieved tick cadence against the 100 ms
    budget, the server's own tick/delivery percentiles, and
    delivered/dropped event and sample counts. The daemon is \"real-time
    at N\" iff cadence holds (≳99 % of expected ticks) with no sample
    drops.

    loadgen="native" swaps the Python client children for the compiled
    native/cdt_loadgen binary (same READY/GO/EVENTS contract, same wire
    bytes, same clip cycle): on this single-core host the Python
    generators themselves fall behind real time past ~1,024 total
    streams (their row is voided by max_client_late), so measuring the
    server's true ceiling requires the per-frame encode cost off the
    interpreter.
    """
    import os
    import subprocess
    import tempfile

    import jax

    from cough_detector_tpu.config import default_config
    from cough_detector_tpu.models import create_model, init_model
    from cough_detector_tpu.serve import DetectionServer

    if loadgen not in ("python", "native"):
        # A typo'd --loadgen must not silently run the Python generators
        # (which fall behind past ~1k streams) under a mislabeled row.
        raise ValueError(f"unknown loadgen {loadgen!r}")
    cfg = default_config("residual")
    model = create_model(cfg.model.model_type)
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )
    server = DetectionServer(
        variables=variables, config=cfg, num_streams=num_streams,
        chunk_size=chunk, confidence_threshold=0.7, smoothing_window=3,
        debounce_seconds=0.5, tick_policy="timer", backend=backend,
        h2d_dtype=h2d_dtype,
    )
    tick_s = chunk / cfg.features.sample_rate
    # Client uplink pacing. Default: one wire frame per server tick
    # (100 ms — live-mic-shaped load). `uplink_s` sends LARGER frames
    # less often at the same bandwidth (batched-uplink clients, e.g.
    # 0.4 s) — the server still ticks every 100 ms and buffers per
    # slot; event latency grows by up to one uplink frame. On this
    # single-core host the per-frame cost of generators + epoll ingest
    # is what saturates first past ~2k streams, so the batched row
    # measures the daemon's capacity rather than the harness's.
    u_s = tick_s if uplink_s is None else float(uplink_s)
    u_chunk = int(round(u_s * cfg.features.sample_rate))
    n_frames = int(round(seconds / u_s))
    repo = os.path.dirname(os.path.abspath(__file__))
    boot = _CLIENT_BOOT.format(repo=repo)

    clip_path = None
    if loadgen == "native":
        from cough_detector_tpu.data import synth

        binary = _ensure_loadgen()
        if binary is None:
            raise RuntimeError("native loadgen needs g++ (not in PATH)")
        # The exact clip+cycle the Python generator feeds, as raw f32le.
        clip = np.resize(
            synth.synthetic_cough(3, 2.0), u_chunk * (n_frames + 1)
        ).astype(np.float32)
        fd_, clip_path = tempfile.mkstemp(suffix=".f32")
        with os.fdopen(fd_, "wb") as fh:
            fh.write(clip.tobytes())

    def spawn(m: int) -> "subprocess.Popen":
        if loadgen == "native":
            cmd = [binary, host, str(port), str(m), str(n_frames),
                   str(int(round(u_s * 1e6))), str(u_chunk), clip_path]
        else:
            cmd = [sys.executable, "-c", boot, host, str(port), str(m),
                   str(n_frames), repr(u_s), str(u_chunk)]
        return subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        )

    try:
        with server:
            host, port = server.address
            per_client = [
                num_streams // n_clients
                + (1 if i < num_streams % n_clients else 0)
                for i in range(n_clients)
            ]
            procs = [spawn(m) for m in per_client]
            for p in procs:
                line = p.stdout.readline()
                if line.strip() != "READY":
                    for q in procs:
                        q.kill()
                    raise RuntimeError(
                        f"daemon bench client failed: {line!r}"
                    )
            # Ticks already run during the open phase (the timer starts
            # with the first slot) must not count toward the timed
            # window. Cadence is measured on the DISPATCH clock over an
            # exact wall window — the timer loop blocks when the
            # delivery pipeline is chronically behind, so missed
            # dispatches are the real-time failure signal; delivery
            # health shows in the lag percentiles and tick counts.
            d0 = server.stats()["dispatched"]
            rss0 = _rss_kb()
            t_start = time.monotonic()
            for p in procs:
                p.stdin.write("GO\n")
                p.stdin.flush()
            time.sleep(seconds)
            elapsed = time.monotonic() - t_start
            d1 = server.stats()["dispatched"]
            total_events = 0
            max_late = 0.0
            for p in procs:
                try:
                    out, _ = p.communicate(timeout=60)
                except subprocess.TimeoutExpired:
                    p.kill()
                    out = ""
                for line in out.splitlines():
                    if line.startswith("EVENTS "):
                        parts = line.split()
                        total_events += int(parts[1])
                        if len(parts) >= 4:
                            max_late = max(max_late, float(parts[3]))
            stats = server.stats()
            rss1 = _rss_kb()
    finally:
        # The clip tempfile must not outlive a failed run (refused
        # handshakes at the ramp's overflow point raise above).
        if clip_path is not None:
            try:
                os.unlink(clip_path)
            except OSError:
                pass
    timed_ticks = d1 - d0
    expected_ticks = elapsed / tick_s
    cadence = timed_ticks / max(expected_ticks, 1e-9)
    record = {
        "metric": "serving_daemon_socket_tier",
        "backend": server.backend,
        "loadgen": loadgen,
        "h2d_dtype": h2d_dtype,
        "num_streams": num_streams,
        "n_clients": n_clients,
        "uplink_frame_s": round(u_s, 3),
        "seconds": round(elapsed, 1),
        "ticks": timed_ticks,
        "tick_budget_ms": round(tick_s * 1e3, 1),
        "tick_ms_p50": stats.get("tick_ms_p50"),
        "tick_ms_p99": stats.get("tick_ms_p99"),
        "delivery_lag_ms_p50": stats.get("delivery_lag_ms_p50"),
        "delivery_lag_ms_p99": stats.get("delivery_lag_ms_p99"),
        "cadence": round(cadence, 4),
        "events_delivered": total_events,
        "events_dropped": stats["events_dropped"],
        "dropped_samples": stats["dropped_samples"],
        "max_client_late_s": round(max_late, 3),
        "rss_kb_start": rss0,
        "rss_kb_end": rss1,
        # Valid only if the generators actually OFFERED the load: a row
        # where clients fell behind real time proves nothing about the
        # server.
        "realtime_at_this_count": bool(
            cadence > 0.99
            and stats["dropped_samples"] == 0
            and max_late < 1.0
        ),
    }
    print(json.dumps(record), flush=True)
    return record


def main(batch: int = None, n_iters: int = 20, mode: str = "high",
         trace: str = None, fresh_h2d: bool = False) -> None:
    """mode: "high" (default, ≤1e-3 parity), "serve" (opt-in mixed
    precision, ~2-5e-4 absolute logits error — docs/PARITY.md), or "bf16"
    (fastest, outside the parity budget).

    trace: optional directory — after the timed loop, capture a
    jax.profiler device trace (TensorBoard/Perfetto-viewable) of a few
    extra iterations via utils/observability.capture_trace. Captured
    AFTER the measurement so profiling overhead can't perturb the
    headline number.

    fresh_h2d: also measure an INGEST-INCLUSIVE row (second JSON line):
    a fresh int16 batch is device_put inside the timed region each
    iteration, pipelined like serving (upload k+1 overlaps compute k).
    The default headline's timed region deliberately EXCLUDES H2D — it
    matches BASELINE.json's "features + classifier" definition and the
    reference baseline it is compared against (whose DataLoader feeds a
    resident GPU tensor) — so this row is where the host→device cost
    shows. int16 is the production ingest dtype (the shard format and
    the serving half-bandwidth tier); on the dev tunnel (~60 MB/s) this
    row is transport-bound and measures the link, on a PCIe host the
    upload roughly matches compute."""
    import jax
    import jax.numpy as jnp

    from cough_detector_tpu.config import default_config
    from cough_detector_tpu.data import synth
    from cough_detector_tpu.models import create_model, init_model
    from cough_detector_tpu.ops import frontend

    cfg = default_config("residual")
    kwargs = {}
    if mode == "serve":
        kwargs["precision_mode"] = "serve"
    elif mode == "bf16":
        kwargs["dtype"] = jnp.bfloat16
    model = create_model(cfg.model.model_type, **kwargs)
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )
    if mode == "bf16":
        from cough_detector_tpu.models import fuse

        variables = jax.tree_util.tree_map(
            jnp.asarray, fuse.fold_batchnorm(variables, cfg.model.model_type)
        )

    @jax.jit
    def forward(waves):
        feats = frontend.extract_features_fast(waves, cfg.features)
        return model.apply(variables, feats, train=False)

    # Timing integrity (measured r2): jax.block_until_ready can silently
    # no-op over the axon tunnel in some process states, letting enqueued
    # work hide outside the timed region. The timed loop therefore chains a
    # scalar through every iteration (so no execution can be elided or
    # deduped) and ends with a HOST FETCH of that scalar, which provably
    # waits for the whole chain. The extra (B, 2)-logits reduction is
    # negligible and fused.
    @jax.jit
    def forward_timed(waves, acc):
        return forward(waves).sum() + acc

    if batch is None:
        # Batch-size scan on v5e (r2, current kernel): 8192→262k,
        # 16384→268k clips/s; 16384 amortizes dispatch/grid overheads best
        # and fits HBM with ~10x headroom.
        batch = 16384
    base = synth.fixture_batch(min(batch, 256), 1.0, seed=0)
    waves = jnp.asarray(np.tile(base, (-(-batch // base.shape[0]), 1))[:batch])

    # Warmup / compile (the fetch forces real completion).
    acc = forward_timed(waves, jnp.float32(0.0))
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = forward_timed(waves, acc)
    float(acc)  # fetch inside the timed region: nothing can hide after it
    dt = (time.perf_counter() - t0) / n_iters

    # vs_baseline derives from the ROUNDED printed value: computing both
    # independently from the raw float lets them disagree in the last
    # digit when value/10k lands on a .0005 boundary (consumers recompute
    # from the printed value).
    value = round(batch / dt, 1)
    record = {
        "metric": "1s_clips_per_sec_per_chip_end_to_end",
        "value": value,
        "unit": "clips/s/chip",
        "vs_baseline": round(value / 10_000.0, 3),
    }
    if mode != "high":
        record["mode"] = mode  # opt-in fast path, outside the default claim
    if trace:
        from cough_detector_tpu.utils.observability import (
            capture_trace,
            trace_span,
        )

        with capture_trace(trace):
            with trace_span("bench_headline_forward"):
                for _ in range(3):
                    acc = forward_timed(waves, acc)
                float(acc)
        record["trace"] = trace
    print(json.dumps(record))

    if fresh_h2d:
        from cough_detector_tpu.data.shards import dequantize_jnp, quantize

        @jax.jit
        def forward_timed_i16(waves_i16, acc):
            return forward(dequantize_jnp(waves_i16)).sum() + acc

        # Smaller batch than the resident headline: each upload is
        # batch x 16000 x 2 bytes, and the axon tunnel retains every
        # device_put's transfer in host RSS (environment leak,
        # BASELINE.md soak) — bound the run's footprint. Two DISTINCT
        # host buffers rotate so no transfer can be deduped.
        fb = min(batch, 4096)
        hosts = [
            quantize(np.tile(base, (-(-fb // base.shape[0]), 1))[:fb]),
            quantize(np.tile(base[::-1], (-(-fb // base.shape[0]), 1))[:fb]),
        ]
        fresh_iters = 4
        cur = jax.device_put(hosts[0])
        acc2 = forward_timed_i16(cur, jnp.float32(0.0))
        float(acc2)  # compile + settle
        t0 = time.perf_counter()
        for i in range(fresh_iters):
            # Pipelined ingest: enqueue the NEXT batch's (async) H2D copy
            # before dispatching this batch's compute, so upload and
            # compute overlap exactly like the serving tick.
            nxt = jax.device_put(hosts[(i + 1) % 2])
            acc2 = forward_timed_i16(cur, acc2)
            cur = nxt
        float(acc2)
        dt2 = (time.perf_counter() - t0) / fresh_iters
        v2 = round(fb / dt2, 1)
        rec2 = {
            "metric": "1s_clips_per_sec_per_chip_ingest_inclusive",
            "value": v2,
            "unit": "clips/s/chip",
            "vs_baseline": round(v2 / 10_000.0, 3),
            "batch": fb,
            "h2d_bytes_per_iter": int(hosts[0].nbytes),
        }
        if mode != "high":
            rec2["mode"] = mode
        print(json.dumps(rec2))


def _flag(name, default, allowed=None, cast=str):
    """Parse one --name value; UNKNOWN values are a hard error — a typo'd
    tier must never silently run the default path under a mislabeled
    benchmark row (same rule the --loadgen parser pinned first)."""
    if name not in sys.argv:
        return default
    value = cast(sys.argv[sys.argv.index(name) + 1])
    if allowed is not None and value not in allowed:
        raise SystemExit(f"{name} must be one of {sorted(allowed)}, "
                         f"got {value!r}")
    return value


if __name__ == "__main__":
    backend = _flag("--backend", "python", {"python", "native", "auto"})
    loadgen = _flag("--loadgen", "python", {"python", "native"})
    h2d = _flag("--h2d", "float32", {"float32", "int16", "mulaw"})
    uplink = _flag("--uplink", None, cast=float)
    if "--daemon-ramp" in sys.argv:
        # Host-side ceiling of the socket tier: ramp stream counts until
        # the timer loop misses cadence or slots overflow. Every row is a
        # real multi-client run at that count.
        ramp_secs = _flag("--seconds", 20.0, cast=float)
        ramp_clients = _flag("--clients", 8, cast=int)
        for s in (512, 1024, 2048, 4096, 8192):
            rec = daemon_bench(num_streams=s, seconds=ramp_secs,
                               n_clients=ramp_clients,
                               backend=backend, loadgen=loadgen,
                               h2d_dtype=h2d, uplink_s=uplink)
            if not rec["realtime_at_this_count"]:
                break
    elif "--daemon" in sys.argv:
        daemon_bench(num_streams=_flag("--streams", 256, cast=int),
                     n_clients=_flag("--clients", 8, cast=int),
                     seconds=_flag("--seconds", 30.0, cast=float),
                     backend=backend, loadgen=loadgen, h2d_dtype=h2d,
                     uplink_s=uplink)
    elif "--serving-sweep" in sys.argv:
        # Measured capacity curve (VERDICT r1 §next-6): every point is a
        # real run at that stream count, not arithmetic from a smaller one.
        # 20,480 is the measured real-time edge (96.9 ms tick); 24,576
        # exceeds the 100 ms budget (BASELINE.md).
        sweep_prec = _flag("--precision", "high", {"high", "serve"})
        for s in (256, 1024, 4096, 8192, 16384, 18432, 20480):
            serving_bench(num_streams=s, precision_mode=sweep_prec)
    elif "--serving" in sys.argv:
        serving_bench(
            num_streams=_flag("--streams", 256, cast=int),
            precision_mode=_flag("--precision", "high",
                                 {"high", "serve"}),
        )
    else:
        main(batch=_flag("--batch", None, cast=int),
             mode=_flag("--mode", "high", {"high", "serve", "bf16"}),
             trace=_flag("--trace", None),
             fresh_h2d="--fresh-h2d" in sys.argv)
