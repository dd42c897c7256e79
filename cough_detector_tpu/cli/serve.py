"""Detection-server CLI: one batched on-device detector, many socket
clients (serve/server.py — a production surface the reference lacks;
serving capacity per chip is measured in BASELINE.md's sweep).

    cdt-serve --model ./checkpoints/best_model --port 7717 --streams 256

Prints one JSON line at startup with the bound address and slot capacity,
then a JSON stats line every --stats-interval seconds until SIGINT.
"""

from __future__ import annotations

import argparse
import json
import signal
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Multi-stream cough detection server")
    p.add_argument("--model", type=str, required=True,
                   help="Checkpoint: Orbax dir or reference .pt")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7717)
    p.add_argument("--streams", type=int, default=256,
                   help="Stream slot capacity (fixed; static tick shapes)")
    p.add_argument("--chunk-ms", type=float, default=100.0)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--smoothing", type=int, default=3)
    p.add_argument("--debounce", type=float, default=0.5)
    p.add_argument("--buffer-seconds", type=float, default=30.0)
    p.add_argument("--tick-policy", choices=["timer", "eager"],
                   default="timer")
    p.add_argument("--liveness", type=float, default=None,
                   help="Eager policy only: seconds one tenant may "
                        "stall the lockstep tick before the server "
                        "ticks anyway (starved lanes zero-fill). Fires "
                        "only while readiness is asymmetric — an "
                        "all-idle daemon never ticks. Default: one "
                        "tick period; 'inf' disables (pure lockstep)")
    p.add_argument("--precision-mode", choices=["high", "serve"],
                   default="high",
                   help='"serve" = opt-in mixed-precision classifier '
                        "(docs/PARITY.md) for trained checkpoints")
    p.add_argument("--backend", choices=["auto", "python", "native"],
                   default="auto",
                   help="Socket tier: native = C++ epoll data plane "
                        "(no Python in the per-frame path; ~4x the "
                        "stream ceiling), python = portable fallback, "
                        "auto = native when the toolchain built it")
    p.add_argument("--h2d-dtype", choices=["float32", "int16", "mulaw"],
                   default="float32",
                   help="Per-tick host→device batch format: int16 = "
                        "16-bit PCM (quantize on assemble, dequantize "
                        "in-jit) — half the upload bytes per tick; "
                        "doubles the ceiling on a bandwidth-bound "
                        "host↔device link. mulaw = 8-bit μ-law "
                        "companding — quarter the bytes, for links "
                        "where even int16 saturates (approximate: "
                        "measured confidence deltas in docs/PARITY.md)")
    p.add_argument("--ingest-workers", type=int, default=1,
                   help="C++ epoll I/O threads (native backend): "
                        "connections partition across workers "
                        "round-robin; raise past 1 on multi-core hosts "
                        "where one core's frame parsing is the ceiling "
                        "(identical semantics at any count)")
    p.add_argument("--stats-interval", type=float, default=10.0)
    p.add_argument("--stats-port", type=int, default=None,
                   help="Serve GET /healthz and /stats (JSON) on this "
                        "HTTP port for scrapers/orchestrators (0 = "
                        "ephemeral; address in the readiness line). "
                        "/healthz turns 200 only once the daemon is "
                        "accepting clients — i.e. after the tick "
                        "program compiled")
    p.add_argument("--max-seconds", type=float, default=None,
                   help="Exit after this long (smoke tests / supervisors)")
    p.add_argument("--compile-cache", type=str, default=None,
                   help="Persistent XLA compile-cache directory: a "
                        "restarted daemon loads its tick program from "
                        "disk instead of recompiling (cold start "
                        "minutes -> seconds; utils.enable_compile_cache)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..serve import DetectionServer
    from ..stream.detector import _load_any_checkpoint

    if args.compile_cache:
        from ..utils import enable_compile_cache

        enable_compile_cache(args.compile_cache)

    variables, config = _load_any_checkpoint(args.model)
    chunk_size = int(config.features.sample_rate * args.chunk_ms / 1000.0)
    server = DetectionServer(
        variables=variables,
        config=config,
        host=args.host,
        port=args.port,
        num_streams=args.streams,
        chunk_size=chunk_size,
        confidence_threshold=args.threshold,
        smoothing_window=args.smoothing,
        debounce_seconds=args.debounce,
        tick_policy=args.tick_policy,
        liveness_seconds=args.liveness,
        buffer_seconds=args.buffer_seconds,
        precision_mode=args.precision_mode,
        backend=args.backend,
        h2d_dtype=args.h2d_dtype,
        ingest_workers=args.ingest_workers,
    )
    # Observability sidecar: starts (and binds) BEFORE the tick compile
    # so orchestrators can poll /healthz through the cold start; flips
    # ready only when the daemon is actually accepting clients.
    stats_http = None
    if args.stats_port is not None:
        from ..serve.stats_http import StatsHttpServer

        stats_http = StatsHttpServer(
            server.stats, host=args.host, port=args.stats_port
        )

    # Supervisors stop daemons with SIGTERM: route it through the same
    # clean path as Ctrl-C so the context manager joins the tick/delivery
    # threads, closes client sockets, and the final stats line prints.
    # The previous handler is restored on the way out — main() must be
    # embeddable (tests, supervisors) without leaking a raising handler
    # into the host process.
    def _sigterm(signum, frame):
        raise KeyboardInterrupt

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:  # not the main thread: no handler, Ctrl-C only
        prev_sigterm = None
    try:
        # The interrupt guard covers start() and shutdown too: the signal
        # can arrive while the tick program is still compiling, or between
        # start() returning and the sleep loop — an escaping raise would
        # unwind the EMBEDDING process (observed as a whole pytest session
        # aborted mid-suite), and a raise inside __enter__ would skip
        # __exit__ and leak the tick/delivery threads. stop() is safe
        # after a partial start, so the finally always runs it.
        try:
            server.start()
            # The deadline starts AFTER start() returns: start() blocks
            # on the tick-program compile (minutes on a cold TPU), and
            # --max-seconds bounds SERVING time, not compile+serving —
            # otherwise a smoke run could exit before ever accepting a
            # client.
            deadline = (time.time() + args.max_seconds
                        if args.max_seconds else None)
            # The readiness line prints only AFTER start() returns — i.e.
            # after the tick program has compiled and the accept loop is
            # live — so a supervisor reading it can immediately open
            # streams.
            if stats_http is not None:
                stats_http.set_ready(True)
            # server.address binds at start() (the native plane is
            # deliberately created only after the tick compile).
            host, port = server.address[0], server.address[1]
            print(json.dumps({
                "serving": True, "host": host, "port": port,
                "streams": args.streams, "chunk_ms": args.chunk_ms,
                "model_type": config.model.model_type,
                "backend": server.backend,
                "h2d_dtype": server.h2d_dtype,
                **({"stats_http": list(stats_http.address)}
                   if stats_http is not None else {}),
            }), flush=True)
            while deadline is None or time.time() < deadline:
                time.sleep(min(args.stats_interval,
                               max(0.0, (deadline - time.time()))
                               if deadline else args.stats_interval)
                           or 0.01)
                print(json.dumps(server.stats()), flush=True)
        except KeyboardInterrupt:
            pass
        finally:
            # Disarm BEFORE shutdown: stop() joins threads (seconds); a
            # supervisor escalating with a second SIGTERM during that
            # window must not raise past this guard — that would be the
            # exact embedding-process abort this handler exists to
            # prevent.
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, signal.SIG_IGN)
            if stats_http is not None:
                stats_http.set_ready(False)  # drain: healthz 503 first
                stats_http.stop()
            server.stop()
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    print(json.dumps({"serving": False, **server.stats()}), flush=True)


if __name__ == "__main__":
    main()
