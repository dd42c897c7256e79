"""Serving-daemon tests: loopback clients against DetectionServer.

The device side is the same StreamingDetector exercised by test_stream.py;
these tests pin the network tier: slot allocation, event routing, capacity
refusal, disconnect cleanup, overflow accounting, and equivalence of
server-delivered events with an in-process detector fed identical audio."""

import os
import time

import numpy as np
import pytest

from cough_detector_tpu.config import default_config
from cough_detector_tpu.data import synth
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.serve import (
    DetectionClient,
    DetectionServer,
    ServerRefused,
)
from cough_detector_tpu.stream.detector import StreamingDetector

import jax

CHUNK = 1600


@pytest.fixture(scope="module")
def model_and_config():
    cfg = default_config("small")
    model = create_model("small")
    variables = init_model(
        model, jax.random.PRNGKey(0), cfg.features.feature_shape
    )
    return variables, cfg


def _make_server(model_and_config, **kw):
    variables, cfg = model_and_config
    kw.setdefault("num_streams", 4)
    kw.setdefault("chunk_size", CHUNK)
    kw.setdefault("confidence_threshold", 0.0)  # every window fires
    kw.setdefault("debounce_seconds", 0.5)
    kw.setdefault("tick_policy", "eager")
    kw.setdefault("mesh", False)
    return DetectionServer(variables=variables, config=cfg, **kw)


def _wait(predicate, timeout=20.0, dt=0.02):
    end = time.time() + timeout
    while time.time() < end:
        if predicate():
            return True
        time.sleep(dt)
    return False


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SERVE_BOOT = (
    "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    "from cough_detector_tpu.cli.serve import main\n"
    "import sys; main(sys.argv[1:])\n"
)


def _spawn_serve_daemon(argv, readiness_timeout=120.0):
    """Popen the serve CLI; return (proc, readiness_line, read_stderr).

    stderr is drained by a background thread — with a plain PIPE left
    unread, a chatty child (XLA/JAX warnings) can fill the ~64 KB pipe
    buffer and block BEFORE printing its readiness line, deadlocking the
    suite on readline(). The readiness readline itself is bounded by a
    watchdog that kills the child, turning a hang into a test failure.
    Callers must read remaining stdout via proc.stdout (NOT communicate(),
    which would race the drain thread on stderr) and call read_stderr()
    only after the child exits.
    """
    import subprocess
    import sys
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVE_BOOT] + list(argv),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=_REPO,
    )
    err_chunks = []
    drain = threading.Thread(
        target=lambda: err_chunks.append(proc.stderr.read()), daemon=True
    )
    drain.start()

    watchdog = threading.Timer(readiness_timeout, proc.kill)
    watchdog.start()
    try:
        line = proc.stdout.readline()
    finally:
        watchdog.cancel()

    def finish(timeout=120.0):
        """Drain remaining stdout until child exit, kill-bounded."""
        killer = threading.Timer(timeout, proc.kill)
        killer.start()
        try:
            rest = proc.stdout.read()
            proc.wait(timeout=timeout)
        finally:
            killer.cancel()
        return rest

    def read_stderr():
        drain.join(timeout=30)
        return err_chunks[0] if err_chunks else ""

    return proc, line, finish, read_stderr


class TestProtocolSurface:
    def test_open_assigns_distinct_slots(self, model_and_config):
        with _make_server(model_and_config) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                slots = {c.open_stream() for _ in range(4)}
                assert len(slots) == 4

    def test_capacity_refusal(self, model_and_config):
        with _make_server(model_and_config, num_streams=4) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                for _ in range(4):
                    c.open_stream()
                with pytest.raises(ServerRefused):
                    c.open_stream()
                assert srv.stats()["refused"] == 1

    def test_disconnect_frees_slots(self, model_and_config):
        with _make_server(model_and_config, num_streams=2) as srv:
            host, port = srv.address
            c1 = DetectionClient(*srv.address)
            c1.open_stream()
            c1.open_stream()
            c1.close()
            assert _wait(lambda: srv.stats()["open_streams"] == 0)
            with DetectionClient(host, port) as c2:
                assert c2.open_stream() in (0, 1)

    def test_overflow_drops_oldest_and_counts(self, model_and_config):
        with _make_server(
            model_and_config, buffer_seconds=0.5, tick_policy="timer",
            num_streams=2,
        ) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                # 4 s of audio in 0.2 s frames into a 0.5 s buffer; ticks
                # drain 0.1 s each ~0.1 s, so most frames must be
                # dropped-oldest and counted.
                for _ in range(20):
                    c.send_audio(sid, np.zeros(3200, np.float32))
                assert _wait(lambda: srv.stats()["dropped_samples"] > 0)


class TestDetectionDelivery:
    def test_events_match_in_process_detector(self, model_and_config):
        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(7, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]

        ref = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        expected = ref.process_chunk(wave)
        assert expected, "fixture should produce detections"

        with _make_server(model_and_config) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                got = c.events(timeout=5.0)
        assert len(got) == len(expected)
        for ev, exp in zip(got, expected):
            assert ev["stream"] == sid
            assert ev["time"] == pytest.approx(exp.time_seconds, abs=1e-6)
            assert ev["confidence"] == pytest.approx(
                exp.confidence, rel=1e-4
            )

    def test_two_clients_isolated_streams(self, model_and_config):
        wave = synth.synthetic_cough(3, 1.5)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        with _make_server(model_and_config, num_streams=2) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as ca, \
                 DetectionClient(host, port) as cb:
                sa = ca.open_stream()
                sb = cb.open_stream()
                for t in range(n_chunks):
                    ca.send_audio(sa, wave[t * CHUNK : (t + 1) * CHUNK])
                    cb.send_audio(sb, np.zeros(CHUNK, np.float32))
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                evs_a = ca.events(timeout=5.0)
                evs_b = cb.events(timeout=5.0)
        # threshold 0 fires on every debounced window for BOTH streams,
        # but each client must only see its own stream id.
        assert evs_a and all(e["stream"] == sa for e in evs_a)
        assert evs_b and all(e["stream"] == sb for e in evs_b)

    def test_cli_smoke(self, model_and_config, tmp_path, capsys):
        import json

        variables, cfg = model_and_config
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        from cough_detector_tpu.cli import serve as serve_cli

        serve_cli.main([
            "--model", str(pt), "--port", "0",
            "--streams", "2", "--max-seconds", "0.5",
            "--stats-interval", "0.2",
        ])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert lines[0]["serving"] is True
        assert lines[-1]["serving"] is False

    def test_stats_http_sidecar(self):
        """The observability sidecar: /healthz gates on readiness,
        /stats returns a fresh JSON snapshot per request, unknown paths
        404, and a stats() exception never takes the scraper down."""
        import json
        import urllib.error
        import urllib.request

        from cough_detector_tpu.serve import StatsHttpServer

        state = {"n": 0, "boom": False}

        def get_stats():
            if state["boom"]:
                raise RuntimeError("synthetic stats failure")
            state["n"] += 1
            return {"ticks": state["n"]}

        srv = StatsHttpServer(get_stats, port=0)
        try:
            host, port = srv.address
            base = f"http://{host}:{port}"

            def get(path):
                try:
                    with urllib.request.urlopen(base + path, timeout=5) as r:
                        return r.status, r.read()
                except urllib.error.HTTPError as e:
                    return e.code, e.read()

            assert get("/healthz")[0] == 503  # not ready yet
            srv.set_ready(True)
            assert get("/healthz") == (200, b"ok")
            s1 = json.loads(get("/stats")[1])
            s2 = json.loads(get("/stats")[1])
            assert s2["ticks"] == s1["ticks"] + 1  # fresh snapshots
            assert get("/nope")[0] == 404
            state["boom"] = True
            code, body = get("/stats")
            assert code == 500 and b"synthetic" in body
            state["boom"] = False
            assert get("/stats")[0] == 200  # scraper survived
            srv.set_ready(False)
            assert get("/healthz")[0] == 503  # drain semantics
        finally:
            srv.stop()

    def test_cli_stats_port_serves_daemon_stats(
        self, model_and_config, tmp_path
    ):
        """cdt-serve --stats-port: the readiness line carries the bound
        HTTP address, /healthz is 200 while serving, and /stats returns
        the daemon's own counters."""
        import json
        import urllib.request

        variables, cfg = model_and_config
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        proc, first_line, finish, read_stderr = _spawn_serve_daemon([
            "--model", str(pt), "--port", "0",
            "--streams", "2", "--stats-interval", "5",
            "--stats-port", "0", "--max-seconds", "30",
        ])
        try:
            first = json.loads(first_line)
            assert first["serving"] is True
            sh, sp = first["stats_http"]
            base = f"http://{sh}:{sp}"
            with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                assert r.status == 200
            with urllib.request.urlopen(base + "/stats", timeout=5) as r:
                stats = json.loads(r.read())
            assert "dispatched" in stats and "open_streams" in stats
            proc.terminate()
            finish()
        finally:
            proc.kill()
        assert proc.returncode == 0, read_stderr()

    def test_cli_compile_cache_populates_and_serves(
        self, model_and_config, tmp_path
    ):
        """--compile-cache routes the tick-program compile through the
        persistent XLA cache: the daemon serves normally and the cache
        directory holds serialized executables afterwards (on the chip
        this turns a restart's minutes-long compile into a disk load —
        measured 25 s -> 7.5 s spawn-to-ready, BASELINE.md). Runs in a
        subprocess: the cache config is process-global and must not
        leak into this suite."""
        import json
        import os
        import subprocess
        import sys

        variables, cfg = model_and_config
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        cache = tmp_path / "xla_cache"
        boot = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from cough_detector_tpu.cli.serve import main\n"
            "import sys; main(sys.argv[1:])\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", boot,
             "--model", str(pt), "--port", "0",
             "--streams", "2", "--max-seconds", "0.3",
             "--compile-cache", str(cache)],
            capture_output=True, text=True, cwd="/root/repo", timeout=180,
        )
        assert out.returncode == 0, out.stderr
        first = json.loads(out.stdout.strip().splitlines()[0])
        assert first["serving"] is True
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
        assert n_entries > 0, "cache dir must hold compiled programs"

    def test_cli_sigterm_clean_shutdown(self, model_and_config, tmp_path):
        """Supervisors stop daemons with SIGTERM, not Ctrl-C: the CLI
        must route it through the same clean path — threads joined,
        final stats line printed, exit 0, no traceback. Runs in a REAL
        subprocess (the actual daemon lifecycle): an in-process variant
        once let the raising handler escape main()'s guard and abort
        the embedding pytest session mid-suite."""
        import json
        import signal as sig

        variables, cfg = model_and_config
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        proc, first_line, finish, read_stderr = _spawn_serve_daemon([
            "--model", str(pt), "--port", "0",
            "--streams", "2", "--stats-interval", "0.2",
        ])
        try:
            # The helper blocked until the readiness line (post-compile);
            # no --max-seconds, so only the signal can end the daemon.
            first = json.loads(first_line)
            assert first["serving"] is True
            proc.send_signal(sig.SIGTERM)
            out = finish()
        finally:
            proc.kill()
        err = read_stderr()
        assert proc.returncode == 0, err
        last = json.loads((first_line + out).strip().splitlines()[-1])
        assert last["serving"] is False
        assert "Traceback" not in err


class TestInt16HalfBandwidthIngest:
    """h2d_dtype="int16": quantize on assemble (host / C++), upload
    16-bit PCM, dequantize inside the jit tick — half the host→device
    bytes per tick. Pins the quantizer convention (i = clip(round(x *
    32768), -32768, 32767), half away from zero), bit-exactness of the
    C++ twin, the in-jit dequant, and end-to-end event delivery."""

    def test_quantize_i16_semantics(self):
        from cough_detector_tpu.serve import quantize_i16

        x = np.array(
            [0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5,
             1.5 / 32768, -1.5 / 32768, 0.4999 / 32768, -0.4999 / 32768,
             np.nan, np.inf, -np.inf],
            np.float32,
        )
        got = quantize_i16(x)
        assert got.dtype == np.int16
        # clip at full scale; round half away from zero at the LSB;
        # non-finite convention: NaN -> 0, +/-inf -> full scale (any 4
        # wire bytes decode to a valid f32, so these CAN arrive).
        np.testing.assert_array_equal(
            got,
            np.array([0, 32767, -32768, 32767, -32768, 16384, -16384,
                      2, -2, 0, 0, 0, 32767, -32768], np.int16),
        )

    def test_native_assemble_i16_matches_host_quantizer(self):
        """The C++ quantize-on-assemble row converter (cdt_ingest.cpp
        cvt_row<int16>) must be bit-exact with serve.quantize_i16, and
        the f32 assemble must pass samples through untouched."""
        import socket as socketlib

        from cough_detector_tpu.serve import native_ingest, quantize_i16
        from cough_detector_tpu.serve import protocol

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        ing = native_ingest.NativeIngest(
            "127.0.0.1", 0, num_streams=2, chunk=CHUNK,
            buffer_cap=4 * CHUNK,
        )
        try:
            rng = np.random.default_rng(7)
            # Out-of-range values exercise the clip path; injected
            # non-finites exercise the pinned NaN->0 / inf->full-scale
            # convention (C++ and host twins must agree bit-for-bit).
            wave = rng.uniform(-1.2, 1.2, CHUNK).astype(np.float32)
            wave[7], wave[8], wave[9] = np.nan, np.inf, -np.inf
            sock = socketlib.create_connection(ing.address)
            sock.sendall(protocol.encode(protocol.OPEN))
            frame = protocol.read_frame(sock)
            assert frame is not None and frame.type == protocol.OPENED
            sid = frame.stream
            sock.sendall(protocol.encode_audio(sid, wave))

            def ready():
                return bool(ing.granted()) or ing.stats()["open_streams"]

            assert _wait(ready, timeout=5.0)
            # One 6.4 KB loopback frame lands in the epoll thread's ring
            # well inside this settle; assemble() CONSUMES, so each
            # format gets its own freshly-sent frame + one read.
            time.sleep(0.5)
            f32 = np.zeros((2, CHUNK), np.float32)
            assert ing.assemble(f32) == 1
            # f32 assemble is a pure pass-through of the wire samples.
            np.testing.assert_array_equal(f32[sid], wave)
            sock.sendall(protocol.encode_audio(sid, wave))
            time.sleep(0.5)
            i16 = np.zeros((2, CHUNK), np.int16)
            assert ing.assemble(i16) == 1
            np.testing.assert_array_equal(i16[sid], quantize_i16(wave))
            sock.close()
        finally:
            ing.stop()

    def test_int16_tick_matches_dequantized_f32_tick(self, model_and_config):
        """stream_step's in-jit dequant: an int16 tick must produce
        IDENTICAL events to an f32 tick carrying i/32768 — same windows,
        same confidences, bit-for-bit on CPU."""
        from cough_detector_tpu.serve import quantize_i16

        variables, cfg = model_and_config

        def make():
            return StreamingDetector(
                variables=variables, config=cfg, num_streams=1,
                chunk_size=CHUNK, confidence_threshold=0.0,
                smoothing_window=3, debounce_seconds=0.5, mesh=False,
            )

        wave = synth.synthetic_cough(11, 1.5)
        n_chunks = wave.size // CHUNK
        q = quantize_i16(wave[: n_chunks * CHUNK]).reshape(n_chunks, CHUNK)

        det_i, det_f = make(), make()
        evs_i, evs_f = [], []
        for t in range(n_chunks):
            evs_i.extend(det_i.collect_events(
                det_i.tick_async(q[t][None, :])
            ))
            evs_f.extend(det_f.collect_events(det_f.tick_async(
                (q[t][None, :].astype(np.float32) / 32768.0)
            )))
        assert evs_i, "fixture should produce detections"
        assert len(evs_i) == len(evs_f)
        for a, b in zip(evs_i, evs_f):
            assert a.time_seconds == b.time_seconds
            assert a.confidence == b.confidence

    def test_server_int16_end_to_end(self, model_and_config):
        """A python-backend daemon with h2d_dtype="int16" must deliver
        the events an in-process engine produces for the QUANTIZED
        audio (the tick quantizes on assemble, dequantizes in-jit)."""
        from cough_detector_tpu.serve import quantize_i16

        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(7, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]

        ref = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        expected = ref.process_chunk(
            quantize_i16(wave).astype(np.float32) / 32768.0
        )
        assert expected, "fixture should produce detections"

        with _make_server(model_and_config, h2d_dtype="int16") as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                got = c.events(timeout=5.0)
        assert len(got) == len(expected)
        for ev, exp in zip(got, expected):
            assert ev["stream"] == sid
            assert ev["time"] == pytest.approx(exp.time_seconds, abs=1e-6)
            assert ev["confidence"] == pytest.approx(
                exp.confidence, rel=1e-4
            )

    def test_native_loadgen_binary_against_daemon(self, model_and_config):
        """The native load generator (native/cdt_loadgen.cpp) speaks the
        same wire contract as bench._daemon_client_main: READY/GO
        handshake, paced AUDIO frames, EVENTS/LATE report. Smoke it
        against a timer-policy daemon."""
        import shutil
        import subprocess
        import tempfile

        if shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        import bench  # repo root is on sys.path via conftest

        binary = bench._ensure_loadgen()
        assert binary is not None

        wave = np.resize(
            synth.synthetic_cough(3, 2.0), CHUNK * 12
        ).astype(np.float32)
        fd_, clip_path = tempfile.mkstemp(suffix=".f32")
        with os.fdopen(fd_, "wb") as fh:
            fh.write(wave.tobytes())
        try:
            with _make_server(
                model_and_config, tick_policy="timer", num_streams=2,
            ) as srv:
                host, port = srv.address
                proc = subprocess.Popen(
                    [binary, "127.0.0.1", str(port), "2", "10",
                     "100000", str(CHUNK), clip_path],
                    stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                    text=True,
                )
                assert proc.stdout.readline().strip() == "READY"
                proc.stdin.write("GO\n")
                proc.stdin.flush()
                out, _ = proc.communicate(timeout=30)
                assert proc.returncode == 0
                parts = out.split()
                assert parts[0] == "EVENTS" and parts[2] == "LATE"
                assert int(parts[1]) > 0  # threshold-0 events delivered
                assert float(parts[3]) < 0.5  # fed on schedule
        finally:
            os.unlink(clip_path)

    def test_native_loadgen_exits_when_server_dies_mid_handshake(self):
        """A server that accepts the connection and immediately drops it
        must make the loadgen EXIT with an error — not spin forever in
        the handshake wait loop for OPENED grants that can never arrive
        (which hung the whole bench parent on a crashed daemon)."""
        import shutil
        import socket as socketlib
        import subprocess
        import tempfile
        import threading

        if shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        import bench  # repo root is on sys.path via conftest

        binary = bench._ensure_loadgen()
        assert binary is not None

        wave = np.resize(
            synth.synthetic_cough(3, 1.0), CHUNK * 4
        ).astype(np.float32)
        fd_, clip_path = tempfile.mkstemp(suffix=".f32")
        with os.fdopen(fd_, "wb") as fh:
            fh.write(wave.tobytes())
        lis = socketlib.socket()
        lis.bind(("127.0.0.1", 0))
        lis.listen(1)
        port = lis.getsockname()[1]

        def _accept_and_drop():
            try:
                conn, _ = lis.accept()
                conn.close()
            except OSError:
                pass

        t = threading.Thread(target=_accept_and_drop, daemon=True)
        t.start()
        try:
            proc = subprocess.run(
                [str(binary), "127.0.0.1", str(port), "2", "10",
                 "100000", str(CHUNK), clip_path],
                capture_output=True, text=True, timeout=20,
            )
            assert proc.returncode == 2
            assert "died mid-handshake" in proc.stderr
        finally:
            lis.close()
            os.unlink(clip_path)


class TestMulawQuarterBandwidthIngest:
    """h2d_dtype="mulaw": 8-bit μ-law companding on assemble, decode
    inside the jit tick — one quarter of the f32 host→device bytes for
    links where even the int16 tick saturates. Pins the mid-tread code
    convention (zero ↔ code 128 exactly — a mid-riser's DC offset on
    digital silence would be amplified to full scale by per-window peak
    normalization), bit-exactness of the C++ twin, the in-jit decoder,
    the companded-fidelity bound, and end-to-end event delivery."""

    def test_quantize_mulaw_semantics(self):
        from cough_detector_tpu.serve import quantize_mulaw

        x = np.array(
            [0.0, -0.0, 1.0, -1.0, 2.0, -2.0, np.nan, np.inf, -np.inf],
            np.float32,
        )
        got = quantize_mulaw(x)
        assert got.dtype == np.uint8
        # zero (either sign) is EXACTLY code 128; clip at full scale;
        # non-finite convention matches quantize_i16 (NaN -> zero code,
        # ±inf -> full scale). Code 0 is unused (G.711-style).
        np.testing.assert_array_equal(
            got, np.array([128, 128, 255, 1, 255, 1, 128, 255, 1], np.uint8)
        )

    def test_mulaw_roundtrip_fidelity(self):
        """decode(encode(x)) error is bounded by half a companded step:
        ~8.7e-5 absolute near zero (int16-like fidelity where audio
        lives), |x|·ln(256)/127/2 ≈ 2.2% relative at full scale."""
        from cough_detector_tpu.serve import dequantize_mulaw, quantize_mulaw

        xs = np.linspace(-1.0, 1.0, 100001).astype(np.float32)
        err = np.abs(dequantize_mulaw(quantize_mulaw(xs)) - xs)
        # Half-step bound, evaluated at each sample's own magnitude:
        # d(decode)/dy = ln(256)·(1/255 + |x|), y-step = 1/127.
        bound = np.log(256.0) * (1.0 / 255.0 + np.abs(xs)) / 127.0 / 2.0
        # 1.05: the decode step's derivative grows by 256^(1/127) ≈ 1.045
        # across one code, so the half-step bound evaluated at the sample
        # itself can undershoot by that factor.
        assert np.all(err <= bound * 1.05 + 1e-9)
        np.testing.assert_array_equal(
            dequantize_mulaw(quantize_mulaw(np.zeros(8, np.float32))),
            np.zeros(8, np.float32),
        )

    def test_native_assemble_u8_matches_host_quantizer(self):
        """The C++ compand-on-assemble converter (cdt_ingest.cpp
        cvt_row<uint8>) must be bit-exact with serve.quantize_mulaw,
        and silence-fill must be code 128, not byte 0."""
        import socket as socketlib

        from cough_detector_tpu.serve import native_ingest, quantize_mulaw
        from cough_detector_tpu.serve import protocol

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        ing = native_ingest.NativeIngest(
            "127.0.0.1", 0, num_streams=2, chunk=CHUNK,
            buffer_cap=4 * CHUNK,
        )
        try:
            rng = np.random.default_rng(11)
            wave = rng.uniform(-1.2, 1.2, CHUNK).astype(np.float32)
            # Quiet region exercises the fine-step end of the compander.
            wave[:400] *= 1e-3
            wave[7], wave[8], wave[9] = np.nan, np.inf, -np.inf
            sock = socketlib.create_connection(ing.address)
            sock.sendall(protocol.encode(protocol.OPEN))
            frame = protocol.read_frame(sock)
            assert frame is not None and frame.type == protocol.OPENED
            sid = frame.stream
            sock.sendall(protocol.encode_audio(sid, wave))

            def ready():
                return bool(ing.granted()) or ing.stats()["open_streams"]

            assert _wait(ready, timeout=5.0)
            time.sleep(0.5)
            u8 = np.zeros((2, CHUNK), np.uint8)
            assert ing.assemble(u8) == 1
            np.testing.assert_array_equal(u8[sid], quantize_mulaw(wave))
            # The closed slot's row is μ-law silence (code 128).
            other = 1 - sid
            np.testing.assert_array_equal(
                u8[other], np.full(CHUNK, 128, np.uint8)
            )
            sock.close()
        finally:
            ing.stop()

    def test_mulaw_tick_matches_host_decoded_f32_tick(
        self, model_and_config
    ):
        """stream_step's in-jit μ-law decode: a uint8 tick must produce
        the same events as an f32 tick carrying the host-decoded
        samples (decoder twins agree to f32 rounding)."""
        from cough_detector_tpu.serve import dequantize_mulaw, quantize_mulaw

        variables, cfg = model_and_config

        def make():
            return StreamingDetector(
                variables=variables, config=cfg, num_streams=1,
                chunk_size=CHUNK, confidence_threshold=0.0,
                smoothing_window=3, debounce_seconds=0.5, mesh=False,
            )

        wave = synth.synthetic_cough(11, 1.5)
        n_chunks = wave.size // CHUNK
        q = quantize_mulaw(wave[: n_chunks * CHUNK]).reshape(n_chunks, CHUNK)

        det_u, det_f = make(), make()
        evs_u, evs_f = [], []
        for t in range(n_chunks):
            evs_u.extend(det_u.collect_events(
                det_u.tick_async(q[t][None, :])
            ))
            evs_f.extend(det_f.collect_events(det_f.tick_async(
                dequantize_mulaw(q[t][None, :])
            )))
        assert evs_u, "fixture should produce detections"
        assert len(evs_u) == len(evs_f)
        for a, b in zip(evs_u, evs_f):
            assert a.time_seconds == b.time_seconds
            # exp2-based jit decode vs expm1-based host decode: equal to
            # f32 rounding, so confidences agree far inside 1e-5.
            assert a.confidence == pytest.approx(b.confidence, abs=1e-5)

    def test_mulaw_confidences_near_exact_f32(self, model_and_config):
        """Companding is an approximation — bound its effect: smoothed
        confidences for μ-law-roundtripped audio stay within a few
        percent of the exact-f32 confidences on the cough fixture."""
        from cough_detector_tpu.serve import quantize_mulaw

        variables, cfg = model_and_config

        def make():
            return StreamingDetector(
                variables=variables, config=cfg, num_streams=1,
                chunk_size=CHUNK, confidence_threshold=0.0,
                smoothing_window=3, debounce_seconds=0.5, mesh=False,
            )

        wave = synth.synthetic_cough(23, 1.5)
        n = (wave.size // CHUNK) * CHUNK
        det_u, det_f = make(), make()
        evs_u = det_u.process_chunk(
            quantize_mulaw(wave[:n])[None, :]
        )
        evs_f = det_f.process_chunk(wave[:n][None, :].astype(np.float32))
        assert len(evs_u) == len(evs_f) and evs_u
        for a, b in zip(evs_u, evs_f):
            assert a.time_seconds == b.time_seconds
            assert a.confidence == pytest.approx(b.confidence, abs=0.05)

    def test_server_mulaw_end_to_end(self, model_and_config):
        """A python-backend daemon with h2d_dtype="mulaw" must deliver
        the events an in-process engine produces for the companded
        audio (compand on assemble, decode in-jit)."""
        from cough_detector_tpu.serve import dequantize_mulaw, quantize_mulaw

        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(7, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]

        ref = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        expected = ref.process_chunk(dequantize_mulaw(quantize_mulaw(wave)))
        assert expected, "fixture should produce detections"

        with _make_server(model_and_config, h2d_dtype="mulaw") as srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                got = c.events(timeout=5.0)
        assert len(got) == len(expected)
        for ev, exp in zip(got, expected):
            assert ev["stream"] == sid
            assert ev["time"] == pytest.approx(exp.time_seconds, abs=1e-6)
            assert ev["confidence"] == pytest.approx(
                exp.confidence, rel=1e-3
            )


class TestServeHardening:
    def test_single_overcap_frame_is_trimmed_and_counted(self):
        """The per-slot buffer cap must bind even when ONE frame exceeds
        it (a 16 MiB AUDIO frame is 262 s of audio): keep the newest cap
        samples, count the rest dropped — same newest-wins rule as the
        C++ ring."""
        from cough_detector_tpu.serve.server import _Slot

        slot = _Slot(owner=None, open_sample=0)
        big = np.arange(10_000, dtype=np.float32)
        dropped = slot.push(big, cap=4_000)
        assert dropped == 6_000
        assert slot.buffered == 4_000
        np.testing.assert_array_equal(slot.pull(4_000), big[6_000:])

    def test_multiframe_overflow_drops_exact_count_like_cpp_ring(self):
        """r4 review: overflow across MULTIPLE queued frames must drop
        exactly (buffered - cap) oldest samples — the C++ ring advances
        `rd` by the exact overflow (cdt_ingest.cpp), and an earlier
        Python version popped whole frames instead, retaining different
        audio and reporting different dropped_samples than the native
        plane for identical wire bytes."""
        from cough_detector_tpu.serve.server import _Slot

        slot = _Slot(owner=None, open_sample=0)
        stream = np.arange(490_000, dtype=np.float32)
        cap = 480_000
        dropped = 0
        # ten 47k frames (470k) then one 20k frame -> 490k > cap
        frames = [stream[i * 47_000 : (i + 1) * 47_000] for i in range(10)]
        frames.append(stream[470_000:490_000])
        for f in frames:
            dropped += slot.push(f, cap=cap)
        assert dropped == 10_000          # exact overflow, not a frame
        assert slot.buffered == cap
        # Retained audio is the newest `cap` samples, contiguous.
        np.testing.assert_array_equal(slot.pull(cap), stream[10_000:])

    def test_stop_closes_live_connections(self, model_and_config):
        """server.stop() must FIN every connected client — a bare
        listener close leaves remote readers hung and leaks one fd plus
        two threads per connection per stop/start cycle."""
        import socket as socketlib

        srv = _make_server(model_and_config, num_streams=2)
        srv.start()
        host, port = srv.address
        raw = socketlib.create_connection((host, port))
        raw.settimeout(5.0)
        srv.stop()
        # EOF (b"") within the timeout proves the server closed us.
        assert raw.recv(1) == b""
        raw.close()

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_eager_silent_tenant_does_not_stall_the_tick(
        self, model_and_config, backend
    ):
        """tick_policy="eager" liveness: the lockstep readiness predicate
        waits for every open slot's chunk, but a tenant that opens a slot
        and then sends NOTHING must not stall scoring for the tenants that
        do feed — after one tick period without readiness the deadline
        fallback ticks anyway (silent lanes zero-fill, as under timer)."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        wave = synth.synthetic_cough(5, 2.0).astype(np.float32)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        srv = _make_server(
            model_and_config, num_streams=2,
            tick_policy="eager", backend=backend,
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as active, \
                    DetectionClient(host, port) as silent:
                s_active = active.open_stream()
                silent.open_stream()  # never feeds a single sample
                for t in range(n_chunks):
                    active.send_audio(
                        s_active, wave[t * CHUNK : (t + 1) * CHUNK]
                    )
                assert _wait(
                    lambda: srv.stats()["ticks"] >= n_chunks, timeout=30.0
                ), "silent tenant stalled the eager tick for everyone"
                assert active.events(timeout=5.0)

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_eager_all_idle_never_ticks(self, model_and_config, backend):
        """Eager liveness is ASYMMETRY-gated: while NO open slot has a
        full chunk buffered there is nobody being stalled, so no
        deadline tick may fire — an idle eager stream's clock freezes
        instead of accumulating injected silence (r3's flake was the
        old unconditional deadline zero-filling lanes whose audio was
        merely delayed in flight). Once audio does arrive, ticks resume
        and the stream scores normally."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        srv = _make_server(
            model_and_config, num_streams=2,
            tick_policy="eager", backend=backend,
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                # > 4 liveness periods of pure idleness (tick period =
                # CHUNK/16000 = 0.1 s): the old code would have fired
                # ~5 zero-fill ticks; the contract is exactly 0.
                time.sleep(5 * CHUNK / 16000)
                assert srv.stats()["ticks"] == 0
                # A partial chunk is still "in flight", not starving
                # anyone — readiness stays 0, still no tick.
                c.send_audio(sid, np.zeros(CHUNK // 2, np.float32))
                time.sleep(3 * CHUNK / 16000)
                assert srv.stats()["ticks"] == 0
                # Completing the chunk makes readiness symmetric (the
                # other slot is unopened) and the tick fires.
                c.send_audio(sid, np.zeros(CHUNK // 2, np.float32))
                assert _wait(lambda: srv.stats()["ticks"] >= 1)

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_eager_liveness_inf_is_pure_lockstep(
        self, model_and_config, backend
    ):
        """liveness_seconds=inf disables the deadline entirely: a silent
        tenant DOES stall the tick (documented trade — only for
        tests/drains that control every lane), so the event stream
        contains no wall-clock element at all."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        srv = _make_server(
            model_and_config, num_streams=2, tick_policy="eager",
            backend=backend, liveness_seconds=float("inf"),
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as active, \
                    DetectionClient(host, port) as silent:
                s_active = active.open_stream()
                silent.open_stream()  # never feeds
                active.send_audio(s_active, np.ones(3 * CHUNK, np.float32))
                time.sleep(5 * CHUNK / 16000)
                assert srv.stats()["ticks"] == 0  # stalled, by contract

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_eager_mid_stream_pause_does_not_perturb_events(
        self, model_and_config, backend
    ):
        """Determinism under delivery stalls — the r3 flake's regression
        test: pausing for many liveness periods in the MIDDLE of a
        stream (simulating full-suite CPU contention delaying frame
        parsing) must leave the event sequence identical to an
        uninterrupted drain, because an all-idle eager server freezes
        the stream clock instead of injecting silence ticks."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(11, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]

        ref = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        expected = ref.process_chunk(wave[None, :])
        assert expected

        srv = DetectionServer(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=CHUNK, confidence_threshold=0.0,
            debounce_seconds=0.5, tick_policy="eager", mesh=False,
            backend=backend,
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    if t == n_chunks // 2:
                        # Drain fully, then stall well past the
                        # liveness deadline with the lane empty.
                        assert _wait(lambda: srv.stats()["ticks"] >= t)
                        time.sleep(4 * CHUNK / 16000)
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                evs = c.events(timeout=5.0)
        assert len(evs) == len(expected)
        for ev, ex in zip(evs, expected):
            assert ev["time"] == pytest.approx(ex.time_seconds, abs=1e-6)
            assert ev["confidence"] == pytest.approx(
                ex.confidence, rel=1e-4
            )

    def test_native_backend_binds_only_after_start(self, model_and_config):
        """The C++ plane accepts and grants slots the moment it binds, so
        it must not exist until start() has compiled the tick program —
        otherwise a client's audio silently ages out of the bounded
        buffer during the minutes-long cold compile."""
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        srv = _make_server(model_and_config, backend="native")
        assert srv.address is None and srv._ingest is None
        with srv:
            assert srv.address is not None
            host, port = srv.address
            with DetectionClient(host, port) as c:
                assert isinstance(c.open_stream(), int)


class TestPerStreamThresholds:
    """Multi-tenant sensitivity: each OPEN may carry its own confidence
    threshold (serve/protocol.py, 4-byte f32le payload), installed on the
    slot's device lane at grant time (stream/ring.py state.threshold) —
    one XLA program serves every tenant mix, both socket backends."""

    def test_engine_per_lane_thresholds(self, model_and_config):
        variables, cfg = model_and_config
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=1, debounce_seconds=0.0, mesh=False,
        )
        det.reset_streams([0, 1], thresholds=[0.0, 1.1])
        wave = synth.synthetic_cough(5, 2.0).astype(np.float32)
        both = np.stack([wave, wave])
        dets = det.process_chunk(both)
        lane0 = [d for d in dets if d.stream == 0]
        lane1 = [d for d in dets if d.stream == 1]
        assert lane0, "threshold-0 lane must fire"
        assert not lane1, "threshold-1.1 lane must never fire"
        # None restores the detector default (0.0 here): lane 1 fires again.
        det.reset_streams([1], thresholds=[None])
        dets2 = det.process_chunk(both)
        assert [d for d in dets2 if d.stream == 1]

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_server_two_tenants_different_thresholds(
        self, model_and_config, backend
    ):
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        wave = synth.synthetic_cough(5, 2.0).astype(np.float32)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        srv = _make_server(
            model_and_config, num_streams=2, backend=backend
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as hot, \
                    DetectionClient(host, port) as cold:
                s_hot = hot.open_stream(threshold=0.0)
                s_cold = cold.open_stream(threshold=1.1)
                for t in range(n_chunks):
                    seg = wave[t * CHUNK : (t + 1) * CHUNK]
                    hot.send_audio(s_hot, seg)
                    cold.send_audio(s_cold, seg)
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                got_hot = hot.events(timeout=5.0)
                got_cold = cold.events(timeout=0.5)
        assert got_hot, "threshold-0 tenant must receive events"
        assert not got_cold, "threshold-1.1 tenant must receive none"

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_thresh_frame_retunes_mid_stream(self, model_and_config, backend):
        """A THRESH frame retunes a live stream's sensitivity without
        reconnecting: muted at 1.1 for the first half, the tenant sends
        THRESH 0.0 and the same stream starts firing — on both socket
        backends."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        wave = synth.synthetic_cough(5, 4.0).astype(np.float32)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        half = n_chunks // 2
        srv = _make_server(
            model_and_config, num_streams=1, backend=backend
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream(threshold=1.1)
                for t in range(half):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= half)
                assert not c.events(timeout=0.3), "muted tenant fired"
                c.set_threshold(sid, 0.0)
                for t in range(half, n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                assert c.events(timeout=5.0), "retuned tenant must fire"

    def test_thresh_for_unowned_slot_is_protocol_error(
        self, model_and_config
    ):
        import socket as socketlib

        from cough_detector_tpu.serve import protocol

        with _make_server(model_and_config, num_streams=2) as srv:
            host, port = srv.address
            bad = socketlib.create_connection((host, port))
            bad.sendall(protocol.encode_thresh(0, 0.5))  # never opened
            fr = protocol.read_frame(bad)
            assert fr is not None and fr.type == protocol.ERROR
            bad.close()

    def test_slot_reuse_restores_default_threshold(self, model_and_config):
        """A tenant's custom threshold must die with its slot: the next
        tenant on the same lane (no threshold in OPEN) gets the server
        default back, not the previous tenant's sensitivity."""
        wave = synth.synthetic_cough(5, 2.0).astype(np.float32)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        srv = _make_server(model_and_config, num_streams=1)
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as a:
                sid = a.open_stream(threshold=1.1)  # mute tenant
                for t in range(n_chunks):
                    a.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                assert not a.events(timeout=0.5)
                a.close_stream(sid)
            with DetectionClient(host, port) as b:
                sid2 = b.open_stream()  # server default (0.0: every window)
                for t in range(n_chunks):
                    b.send_audio(sid2, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(
                    lambda: srv.stats()["ticks"] >= 2 * n_chunks
                )
                assert b.events(timeout=5.0)

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_stale_thresh_is_purged_on_release(
        self, model_and_config, backend
    ):
        """Cross-tenant isolation: a THRESH retune still queued when its
        sender closes must NOT apply to the slot's next tenant. Tenant A
        opens, queues a muting retune (1.1) and closes back-to-back (all
        inside one tick period); tenant B reuses the slot at threshold 0
        and must fire — both socket backends purge pending control-plane
        work at slot release."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        wave = synth.synthetic_cough(5, 2.0).astype(np.float32)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        srv = _make_server(model_and_config, num_streams=1, backend=backend)
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as a:
                sid = a.open_stream(threshold=0.0)
                a.set_threshold(sid, 1.1)  # muting retune, likely queued
                a.close_stream(sid)
            assert _wait(lambda: srv.stats()["open_streams"] == 0)
            with DetectionClient(host, port) as b:
                sid2 = b.open_stream(threshold=0.0)
                base = srv.stats()["ticks"]
                for t in range(n_chunks):
                    b.send_audio(sid2, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(
                    lambda: srv.stats()["ticks"] >= base + n_chunks
                )
                assert b.events(timeout=5.0), (
                    "a stale THRESH retune leaked to the next tenant"
                )

    def test_malformed_open_payload_is_protocol_error(self, model_and_config):
        """OPEN with a payload that is neither empty nor 4 bytes must get
        an ERROR and cost nothing: the slot pool stays intact."""
        import socket as socketlib

        from cough_detector_tpu.serve import protocol

        with _make_server(model_and_config, num_streams=2) as srv:
            host, port = srv.address
            bad = socketlib.create_connection((host, port))
            bad.sendall(protocol.encode(protocol.OPEN, 0, b"\x01\x02\x03"))
            fr = protocol.read_frame(bad)
            assert fr is not None and fr.type == protocol.ERROR
            bad.close()
            # NaN threshold is refused too (native parity: C++ checks
            # isfinite).
            bad2 = socketlib.create_connection((host, port))
            import struct as structlib

            bad2.sendall(protocol.encode(
                protocol.OPEN, 0, structlib.pack("<f", float("nan"))
            ))
            fr2 = protocol.read_frame(bad2)
            assert fr2 is not None and fr2.type == protocol.ERROR
            bad2.close()
            # Pool intact: both slots still grantable.
            with DetectionClient(host, port) as c:
                assert {c.open_stream(), c.open_stream()} == {0, 1}


class TestNativeIngestWireFuzz:
    """Adversarial bytes against the C++ wire parser (cdt_ingest.cpp):
    seeded random garbage, truncated headers, oversized length fields
    and handshake churn must never crash the epoll thread, leak slots,
    or disturb a healthy tenant sharing the plane. Parametrized over
    the worker count: the multi-worker plane (connections partitioned
    across 4 epoll threads) must be exactly as crash/leak-proof as the
    single-epoll one."""

    def _plane(self, n=2, workers=1):
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        return native_ingest.NativeIngest(
            "127.0.0.1", 0, num_streams=n, chunk=CHUNK,
            buffer_cap=4 * CHUNK, num_workers=workers,
        )

    @pytest.mark.parametrize("workers", [1, 4])
    def test_garbage_floods_sever_only_the_offender(self, workers):
        import socket as socketlib
        import struct

        from cough_detector_tpu.serve import protocol

        ing = self._plane(workers=workers)
        try:
            good = socketlib.create_connection(ing.address)
            good.sendall(protocol.encode(protocol.OPEN))
            fr = protocol.read_frame(good)
            assert fr is not None and fr.type == protocol.OPENED
            sid = fr.stream

            rng = np.random.default_rng(17)
            for _ in range(8):
                bad = socketlib.create_connection(ing.address)
                blob = rng.integers(
                    0, 256, int(rng.integers(1, 5000)), dtype=np.uint8
                ).tobytes()
                try:
                    bad.sendall(blob)
                    bad.settimeout(2.0)
                    bad.recv(4096)  # ERROR or empty (severed)
                except OSError:
                    pass
                bad.close()
            # Oversized length field on a valid header: must sever, not
            # allocate 1 GiB.
            bad = socketlib.create_connection(ing.address)
            bad.sendall(struct.pack(
                "<HBBII", 0x0CD7, protocol.AUDIO, 0, sid, 1 << 30
            ))
            bad.settimeout(2.0)
            try:
                bad.recv(4096)
            except OSError:
                pass
            bad.close()

            # The healthy tenant still streams: its audio lands in the
            # next assemble untouched.
            wave = np.linspace(-0.5, 0.5, CHUNK).astype(np.float32)
            good.sendall(protocol.encode_audio(sid, wave))
            assert _wait(
                lambda: bool(ing.granted())
                or ing.stats()["open_streams"] == 1,
                timeout=5.0,
            )
            time.sleep(0.5)
            dst = np.zeros((2, CHUNK), np.float32)
            assert ing.assemble(dst) == 1
            np.testing.assert_array_equal(dst[sid], wave)
            good.close()
        finally:
            ing.stop()

    @pytest.mark.parametrize("workers", [1, 4])
    def test_truncated_header_churn_leaks_nothing(self, workers):
        import socket as socketlib

        from cough_detector_tpu.serve import protocol

        ing = self._plane(workers=workers)
        try:
            for i in range(32):
                c = socketlib.create_connection(ing.address)
                # A header cut mid-field, then an abrupt disconnect.
                c.sendall(b"\xd7\x0c\x01")
                c.close()
            # Open/close churn on the REAL handshake: every slot must
            # return to the pool.
            for i in range(8):
                c = socketlib.create_connection(ing.address)
                c.sendall(protocol.encode(protocol.OPEN))
                fr = protocol.read_frame(c)
                assert fr is not None and fr.type == protocol.OPENED
                c.close()
            ing.granted()  # drain grant queue (activation is irrelevant)
            assert _wait(
                lambda: ing.stats()["open_streams"] == 0, timeout=5.0
            )
            # Pool intact: both slots still grantable.
            c1 = socketlib.create_connection(ing.address)
            c1.sendall(protocol.encode(protocol.OPEN))
            c2 = socketlib.create_connection(ing.address)
            c2.sendall(protocol.encode(protocol.OPEN))
            f1, f2 = protocol.read_frame(c1), protocol.read_frame(c2)
            assert {f1.type, f2.type} == {protocol.OPENED}
            assert f1.stream != f2.stream
            c1.close()
            c2.close()
        finally:
            ing.stop()


class TestMultiWorkerIngest:
    """Multi-worker native plane (r4 VERDICT weak #7 — the horizontal
    scaling path past one core's frame parsing, now code not prose):
    connections partition round-robin across N epoll I/O threads
    (cdt_ingest.cpp struct Worker) while the slot registry stays shared,
    so slot grants, tick assembly, event delivery and churn accounting
    must be BYTE-IDENTICAL at any worker count. 8 deterministic tenants
    over 4 workers puts 2 connections on every worker."""

    def _drive(self, workers):
        import socket as socketlib

        from cough_detector_tpu.serve import native_ingest, protocol

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        S = 8
        ing = native_ingest.NativeIngest(
            "127.0.0.1", 0, num_streams=S, chunk=CHUNK,
            buffer_cap=4 * CHUNK, num_workers=workers,
        )
        out = {}
        try:
            socks, sids = [], []
            for i in range(S):
                c = socketlib.create_connection(ing.address)
                c.sendall(protocol.encode(protocol.OPEN))
                fr = protocol.read_frame(c)
                assert fr is not None and fr.type == protocol.OPENED
                socks.append(c)
                sids.append(fr.stream)
            # Sequential handshakes → deterministic slot order, every
            # worker owns S/workers connections.
            assert sorted(sids) == list(range(S))

            grants = {}

            def drained():
                for sid, gen, _thr in ing.granted():
                    grants[sid] = gen
                return len(grants) == S
            assert _wait(drained, timeout=10.0)

            waves = {}
            for c, sid in zip(socks, sids):
                w = (0.1 + 0.1 * sid) * np.sin(
                    np.linspace(0, 3.0 + sid, CHUNK, dtype=np.float32)
                ).astype(np.float32)
                waves[sid] = w
                c.sendall(protocol.encode_audio(sid, w))
            assert _wait(lambda: ing.readiness() == 2, timeout=10.0)
            dst = np.zeros((S, CHUNK), np.float32)
            assert ing.assemble(dst) == S
            for sid in sids:
                np.testing.assert_array_equal(dst[sid], waves[sid])
            out["batch"] = dst.copy()

            # One event per slot: each must land ONLY on its owner, and
            # the wire payload must not depend on which worker carries
            # the connection.
            slots = np.asarray(sids, np.int32)
            gens = np.asarray([grants[sid] for sid in sids], np.uint32)
            times = np.asarray([1.0 + sid for sid in sids], np.float64)
            confs = np.asarray(
                [0.5 + sid / 100.0 for sid in sids], np.float32
            )
            ing.send_events(slots, gens, times, confs)
            events = {}
            for c, sid in zip(socks, sids):
                c.settimeout(10.0)
                fr = protocol.read_frame(c)
                assert fr is not None and fr.type == protocol.EVENT
                assert fr.stream == sid
                events[sid] = fr.payload
            out["events"] = events

            # Churn across workers: half the tenants leave; their slots
            # return to the pool regardless of which worker reaps them.
            for c in socks[::2]:
                c.close()
            assert _wait(
                lambda: ing.stats()["open_streams"] == S // 2, timeout=10.0
            )
            out["open_after_churn"] = ing.stats()["open_streams"]
            for c in socks[1::2]:
                c.close()
        finally:
            ing.stop()
        return out

    def test_semantics_identical_across_worker_counts(self):
        one = self._drive(1)
        four = self._drive(4)
        np.testing.assert_array_equal(one["batch"], four["batch"])
        assert one["events"] == four["events"]
        assert one["open_after_churn"] == four["open_after_churn"] == 4


class TestIsolationAndRecovery:
    def test_reset_streams_scrubs_only_the_given_lanes(self, model_and_config):
        """Engine-level: reset_streams zeroes the slot's ring buffer,
        smoothing history and debounce clock without touching other lanes
        or the shared lockstep counters."""
        variables, cfg = model_and_config
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        wave = synth.synthetic_cough(5, 1.5)
        n = (wave.size // CHUNK) * CHUNK
        both = np.stack([wave[:n], wave[:n] * 0.5])
        det.process_chunk(both)
        st = det._state
        assert float(np.abs(np.asarray(st.buffer[0])).max()) > 0
        windows_before = int(st.windows_emitted)

        det.reset_streams([0])
        st = det._state
        assert float(np.abs(np.asarray(st.buffer[0])).max()) == 0.0
        assert float(np.abs(np.asarray(st.history[0])).max()) == 0.0
        assert int(st.history_len[0]) == 0  # smoothing deque restarts empty
        assert int(st.last_fire_window[0]) == -(1 << 24)
        # lane 1 and the shared clocks are untouched
        assert float(np.abs(np.asarray(st.buffer[1])).max()) > 0
        assert int(st.history_len[1]) > 0
        assert int(st.windows_emitted) == windows_before

    def test_reset_streams_compiles_one_program_for_any_lane_count(
        self, model_and_config
    ):
        """The lane-reset program takes a FIXED-shape (num_streams,) mask,
        so resets of 0, 1 or many slots in a tick all hit one compiled
        XLA program — a per-count recompile would stall the real-time
        tick loop for minutes over a cold TPU tunnel."""
        variables, cfg = model_and_config
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=4,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        det.reset_streams([])  # the serve pre-warm call
        compiled = det._reset_fn._cache_size()
        for idx in ([1], [0, 2], [0, 1, 2, 3]):
            det.reset_streams(idx)
        assert det._reset_fn._cache_size() == compiled == 1

    def test_slot_reuse_is_retimed_and_padding_windows_suppressed(
        self, model_and_config
    ):
        """A reused slot reports times relative to its own open, and the
        zero-padded windows that precede one full window of the tenant's
        own audio never surface as events."""
        wave = synth.synthetic_cough(5, 1.5)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        window_s = 1.0
        hop_s = 0.25

        with _make_server(model_and_config, num_streams=1) as srv:
            host, port = srv.address
            with DetectionClient(host, port) as ca:
                sa = ca.open_stream()
                for t in range(n_chunks):
                    ca.send_audio(sa, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                evs_a = ca.events(timeout=5.0)
            assert _wait(lambda: srv.stats()["open_streams"] == 0)

            with DetectionClient(host, port) as cb:
                sb = cb.open_stream()
                assert sb == sa  # same slot, reused mid-stream
                # Base BEFORE feeding: eager ticks now fire only for
                # offered audio, so ticks can never exceed base+n_chunks.
                target = srv.stats()["ticks"] + n_chunks
                for t in range(n_chunks):
                    cb.send_audio(sb, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= target)
                evs_b = cb.events(timeout=5.0)

        assert evs_a and evs_b
        for evs in (evs_a, evs_b):
            for e in evs:
                # no event from a window overlapping pre-open padding...
                assert e["time"] >= window_s - 1e-9
                # ...and times sit on the slot-relative hop grid.
                assert (e["time"] / hop_s) == pytest.approx(
                    round(e["time"] / hop_s), abs=1e-6
                )

    def test_native_backend_event_parity_and_reuse(self, model_and_config):
        """The C++ socket plane (native/cdt_ingest.cpp) must reproduce
        the python tier's observable behavior over the identical wire
        protocol: exact event parity with the in-process detector,
        capacity refusal, protocol violations severing only the
        offender, disconnect freeing slots, and reuse isolation (new
        tenant retimed, padding windows suppressed)."""
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(7, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        def expected_for_offset(k: int):
            """In-process reference events for audio that starts k ticks
            after the slot's first scored tick (timer policy: a tick can
            legitimately fire between OPENED and the first AUDIO frame;
            the lane then scores k ticks of silence first — identical
            lane timeline, shifted grid)."""
            ref = StreamingDetector(
                variables=variables, config=cfg, num_streams=1,
                chunk_size=CHUNK, confidence_threshold=0.0,
                smoothing_window=3, debounce_seconds=0.5, mesh=False,
            )
            shifted = np.concatenate(
                [np.zeros(k * CHUNK, np.float32), wave]
            )
            return ref.process_chunk(shifted)

        expected0 = expected_for_offset(0)
        assert expected0

        srv = DetectionServer(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, confidence_threshold=0.0,
            debounce_seconds=0.5, tick_policy="timer", mesh=False,
            backend="native",
        )
        assert srv.backend == "native"
        with srv:
            host, port = srv.address

            def feed_and_collect(client, sid):
                base = srv.stats()["dispatched"]
                for t in range(n_chunks):
                    client.send_audio(
                        sid, wave[t * CHUNK : (t + 1) * CHUNK]
                    )
                assert _wait(
                    lambda: srv.stats()["ticks"] >= base + n_chunks + 4,
                    timeout=(n_chunks + 10) * 0.1 + 5,
                )
                return client.events(timeout=3.0)

            def _matches(got, expected):
                if len(got) != len(expected):
                    return False
                return all(
                    abs(ev["time"] - exp.time_seconds) < 1e-6
                    and ev["confidence"] == pytest.approx(
                        exp.confidence, rel=1e-4
                    )
                    for ev, exp in zip(got, expected)
                )

            def assert_parity(got, slot):
                assert got and all(e["stream"] == slot for e in got)
                # A timer tick may land between OPENED and the first
                # AUDIO frame, shifting the lane's audio by whole ticks.
                # At threshold 0 the first event TIME is offset-invariant
                # (it sits on the suppression boundary for every k), so
                # discriminate by matching the FULL event sequence —
                # times AND confidences — against each plausible offset,
                # demanding exact parity with whichever one holds.
                for k in range(0, 6):
                    if _matches(got, expected_for_offset(k)):
                        return
                raise AssertionError(
                    f"event sequence matches no tick offset in 0..5; "
                    f"first events: {got[:3]}"
                )

            # Phase 1 — EXACT parity. The first-ever open joins the
            # lockstep clock at sample 0 (no tick has run: the timer
            # skips while no slot is open), so the in-process reference
            # applies directly; expected_for_offset covers the rare case
            # of a tick firing between OPENED and the first AUDIO frame.
            with DetectionClient(host, port) as ca:
                sa = ca.open_stream()
                assert_parity(feed_and_collect(ca, sa), sa)
                sb = ca.open_stream()
                with pytest.raises(ServerRefused):
                    ca.open_stream()  # capacity refusal via ERROR frame
                assert srv.stats()["refused"] == 1
            # Disconnect frees both slots.
            assert _wait(lambda: srv.stats()["open_streams"] == 0)

            # Phase 2 — reuse: a recycled slot joins MID-stream (any
            # 0.1 s tick boundary, not just the 0.25 s hop grid), so
            # assert the timing contract rather than content parity:
            # events only after one full window of own audio, debounce
            # honored, all times on the tick/hop lattice, right slot id.
            with DetectionClient(host, port) as cb:
                s2 = cb.open_stream()
                assert s2 in (sa, sb)
                got2 = feed_and_collect(cb, s2)
                assert len(got2) >= 2
                times = [e["time"] for e in got2]
                assert all(e["stream"] == s2 for e in got2)
                assert all(t >= 1.0 - 1e-9 for t in times)  # suppression
                assert all(
                    b - a >= 0.5 - 1e-6
                    for a, b in zip(times, times[1:])
                )  # debounce
                for t in times:  # 0.25a - 0.1b lattice → 0.05 grid
                    assert (t / 0.05) == pytest.approx(
                        round(t / 0.05), abs=1e-4
                    )

            # Protocol violation severs only the offender.
            import socket as socketlib

            from cough_detector_tpu.serve import protocol

            bad = socketlib.create_connection((host, port))
            bad.sendall(protocol.encode(protocol.AUDIO, 0, b"123"))
            frame = protocol.read_frame(bad)
            assert frame is not None and frame.type == protocol.ERROR
            assert protocol.read_frame(bad) is None
            bad.close()
            with DetectionClient(host, port) as cc:
                assert isinstance(cc.open_stream(), int)

    def test_auto_backend_resolves_native_for_both_policies(
        self, model_and_config
    ):
        """backend="auto" must pick the native plane for BOTH tick
        policies when the toolchain built it — a leftover timer-only
        condition once silently downgraded eager daemons to the python
        tier (1/4 the documented ceiling) with no error."""
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        for policy in ("timer", "eager"):
            srv = _make_server(
                model_and_config, tick_policy=policy, backend="auto",
                num_streams=2,
            )
            try:
                assert srv.backend == "native", policy
            finally:
                # Never started; only the ingest plane needs closing.
                if srv._ingest is not None:
                    srv._ingest.stop()

    def test_native_backend_eager_exact_parity(self, model_and_config):
        """Native plane + eager policy (cdt_ingest_readiness): ticks fire
        in lockstep with the offered audio, so events must match the
        in-process engine EXACTLY — no tick-offset search, unlike the
        timer-policy test above where a wall-clock tick can land between
        OPENED and the first AUDIO frame. liveness_seconds=inf makes the
        lockstep a hard guarantee: with the deadline disabled, NO
        wall-clock element remains in the eager loop, so full-suite CPU
        contention (which flaked this test in r3 by delaying frame
        parsing past one tick period, firing a zero-fill deadline tick
        mid-stream) cannot perturb the event sequence."""
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        variables, cfg = model_and_config
        wave = np.concatenate([
            synth.synthetic_cough(7, 1.5),
            np.zeros(8000, np.float32),
        ])
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]

        ref = StreamingDetector(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, confidence_threshold=0.0,
            smoothing_window=3, debounce_seconds=0.5, mesh=False,
        )
        expected = ref.process_chunk(np.stack([wave, wave]))
        assert expected

        srv = DetectionServer(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, confidence_threshold=0.0,
            debounce_seconds=0.5, tick_policy="eager", mesh=False,
            backend="native", liveness_seconds=float("inf"),
        )
        assert srv.backend == "native"
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as ca, \
                 DetectionClient(host, port) as cb:
                sa = ca.open_stream()
                sb = cb.open_stream()
                for t in range(n_chunks):
                    ca.send_audio(sa, wave[t * CHUNK : (t + 1) * CHUNK])
                    cb.send_audio(sb, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                evs_a = ca.events(timeout=5.0)
                evs_b = cb.events(timeout=1.0)
        # Both lanes fed identical audio in lockstep: every event matches
        # the in-process engine exactly, per stream.
        per_stream = {sa: evs_a, sb: evs_b}
        for sid, evs in per_stream.items():
            exp = [e for e in expected if e.stream == 0]
            assert len(evs) == len(exp)
            for ev, ex in zip(evs, exp):
                assert ev["stream"] == sid
                assert ev["time"] == pytest.approx(
                    ex.time_seconds, abs=1e-6
                )
                assert ev["confidence"] == pytest.approx(
                    ex.confidence, rel=1e-4
                )

    def test_native_backend_overflow_drops_oldest_and_counts(
        self, model_and_config
    ):
        from cough_detector_tpu.serve import native_ingest

        if not native_ingest.available():
            pytest.skip("no native toolchain")
        variables, cfg = model_and_config
        srv = DetectionServer(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=CHUNK, tick_policy="timer", mesh=False,
            backend="native", buffer_seconds=0.5,
        )
        with srv:
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                # 4 s of audio, un-paced, into a 0.5 s ring: the oldest
                # samples must be dropped and counted.
                for _ in range(20):
                    c.send_audio(sid, np.zeros(3200, np.float32))
                assert _wait(lambda: srv.stats()["dropped_samples"] > 0)

    def test_fetch_failure_does_not_wedge_delivery(self, model_and_config):
        """A transient event-fetch failure must not kill the in-order
        delivery pipeline: the failed tick posts empty detections, is
        counted, and every later tick still reaches clients."""
        wave = synth.synthetic_cough(5, 1.5)
        n_chunks = wave.size // CHUNK
        wave = wave[: n_chunks * CHUNK]
        srv = _make_server(model_and_config, num_streams=1)
        with srv:
            # Patch AFTER start(): the warmup itself calls collect_events.
            orig = srv._detector.collect_events
            state = {"calls": 0}

            def flaky(events):
                state["calls"] += 1
                if state["calls"] == 1:
                    raise RuntimeError("synthetic transfer failure")
                return orig(events)

            srv._detector.collect_events = flaky
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                got = c.events(timeout=5.0)
            stats = srv.stats()
        assert stats["tick_errors"] == 1
        assert got, "later ticks must still deliver"

    def test_hung_fetch_bounds_dispatch_and_fetched(self, model_and_config):
        """One wedged event fetch must not let the pipeline run away: the
        other fetch workers keep completing later serials, but dispatch is
        gated on ROUTING progress, so _fetched stays bounded (and the
        native assembly-buffer pool can never wrap onto a buffer an
        in-flight tick still reads). Releasing the hung fetch drains
        everything in order."""
        import threading

        wave = synth.synthetic_cough(7, 4.0)
        n_chunks = wave.size // CHUNK
        srv = _make_server(
            model_and_config, num_streams=1, delivery_workers=2
        )
        release = threading.Event()
        try:
            with srv:
                orig = srv._detector.collect_events
                state = {"calls": 0}

                def hung(events):
                    state["calls"] += 1
                    if state["calls"] == 1:
                        release.wait(timeout=30.0)
                    return orig(events)

                srv._detector.collect_events = hung
                host, port = srv.address
                with DetectionClient(host, port) as c:
                    sid = c.open_stream()
                    for t in range(n_chunks):
                        c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                    # Serial 0's fetch is wedged → the router can't route
                    # anything → dispatch must park at the gate.
                    assert _wait(
                        lambda: srv.stats()["dispatched"] >= srv._max_ahead
                    )
                    time.sleep(0.5)  # give a runaway pipeline rope
                    stats = srv.stats()
                    assert stats["dispatched"] <= srv._max_ahead
                    assert stats["routed"] == 0
                    assert len(srv._fetched) <= srv._max_ahead
                    release.set()
                    assert _wait(
                        lambda: srv.stats()["ticks"]
                        == srv.stats()["dispatched"]
                        and srv.stats()["dispatched"] >= n_chunks
                    )
                    assert c.events(timeout=5.0)
        finally:
            release.set()

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_failed_scrub_is_retried_not_lost(
        self, model_and_config, backend
    ):
        """granted()/pending-reset drains are destructive; a transient
        reset_streams failure (the tick loop contains it) must leave the
        grant in the pending stash and RETRY next tick — never hand an
        activated lane to a new tenant with the previous occupant's
        smoothing/debounce/threshold state (r4 advisor, both backends)."""
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("native ingest plane not built")
        wave = synth.synthetic_cough(11, 2.0)
        n_chunks = wave.size // CHUNK
        srv = _make_server(
            model_and_config, num_streams=2, backend=backend
        )
        with srv:
            orig = srv._detector.reset_streams
            calls = []

            def flaky(sids, thresholds=None):
                calls.append(list(sids))
                if len(calls) == 1:
                    raise RuntimeError("synthetic tunnel failure")
                return orig(sids, thresholds=thresholds)

            srv._detector.reset_streams = flaky
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: len(calls) >= 2)
                # The retry re-applies the SAME slot's scrub.
                assert calls[1] == calls[0] and sid in calls[0]
                assert _wait(
                    lambda: srv.stats()["tick_dispatch_errors"] >= 1
                )
                # The stream still works end to end after the retry.
                got = c.events(timeout=10.0)
            stats = srv.stats()
        assert got, "post-retry ticks must deliver events"
        assert stats["tick_dispatch_errors"] >= 1
        if backend == "python":
            assert srv._pending_resets == []
        else:
            assert srv._unscrubbed_grants == []

    def test_python_dispatch_failure_counts_dropped_audio(
        self, model_and_config
    ):
        """Python backend: a dispatch failure AFTER the per-slot pull
        discards one tick of audio — it must land in dropped_samples so
        both backends account identically under the same transient error
        (r4 advisor)."""
        wave = synth.synthetic_cough(12, 2.0)
        n_chunks = wave.size // CHUNK
        srv = _make_server(
            model_and_config, num_streams=2, backend="python"
        )
        with srv:
            orig = srv._detector.tick_async
            state = {"calls": 0}

            def flaky(batch):
                state["calls"] += 1
                if state["calls"] == 1:
                    raise RuntimeError("synthetic dispatch failure")
                return orig(batch)

            srv._detector.tick_async = flaky
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                for t in range(n_chunks):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(
                    lambda: srv.stats()["tick_dispatch_errors"] >= 1
                )
                assert _wait(
                    lambda: srv.stats()["dropped_samples"] >= CHUNK
                )
                got = c.events(timeout=10.0)
            stats = srv.stats()
        assert got, "later ticks must still deliver"
        # Exactly one tick's pull was discarded for the one open stream.
        assert stats["dropped_samples"] == CHUNK

    def test_daemon_bench_harness_smoke(self):
        """bench.py --daemon end-to-end on the loopback: clients feed
        real-time PCM, the pipelined tick holds cadence, events arrive."""
        import bench  # repo root is on sys.path via conftest

        rec = bench.daemon_bench(num_streams=4, n_clients=2, seconds=3.0)
        assert rec["ticks"] >= 25  # ~30 expected at 100 ms cadence
        assert rec["cadence"] > 0.9
        assert rec["dropped_samples"] == 0
        assert rec["events_delivered"] > 0

    def test_protocol_violation_gets_error_and_server_survives(
        self, model_and_config
    ):
        import socket as socketlib

        from cough_detector_tpu.serve import protocol

        with _make_server(model_and_config, num_streams=2) as srv:
            host, port = srv.address
            bad = socketlib.create_connection((host, port))
            # Misaligned AUDIO payload for an unowned slot: violation.
            bad.sendall(protocol.encode(protocol.AUDIO, 0, b"12345"))
            frame = protocol.read_frame(bad)
            assert frame is not None and frame.type == protocol.ERROR
            # The offending connection is closed...
            assert protocol.read_frame(bad) is None
            bad.close()
            # ...and the server still serves others.
            with DetectionClient(host, port) as c:
                assert isinstance(c.open_stream(), int)


class TestDaemonOverMesh:
    """The daemon's default MULTI-DEVICE path (VERDICT r3 weak #2): on any
    multi-device host, DetectionServer(mesh=None) auto-shards the stream
    axis (stream/detector.py), so the packed-event fetch, the lane-masked
    slot scrubs and the THRESH retunes all cross SHARDED device state.
    These tests run that composition on the 8-device CPU mesh and pin
    event parity against the single-device daemon through one scripted
    multi-tenant scenario: OPEN -> audio -> EVENT, a mid-stream THRESH
    mute, and a close -> reopen slot-reuse scrub. Reference capability
    being scaled: /root/reference/src/inference.py:250-429."""

    N_STREAMS = 8

    def _scenario(self, model_and_config, backend, mesh_arg):
        variables, cfg = model_and_config
        srv = DetectionServer(
            variables=variables, config=cfg,
            num_streams=self.N_STREAMS, chunk_size=CHUNK,
            confidence_threshold=0.0, debounce_seconds=0.5,
            tick_policy="eager", liveness_seconds=float("inf"),
            mesh=mesh_arg, backend=backend,
        )
        waves = []
        for k in range(self.N_STREAMS):
            w = np.concatenate([
                synth.synthetic_cough(k, 1.5),
                np.zeros(8000, np.float32),
            ])
            waves.append(w[: (w.size // CHUNK) * CHUNK])
        n_chunks = min(w.size // CHUNK for w in waves)
        half = n_chunks // 2
        events = {}
        with srv:
            if isinstance(mesh_arg, jax.sharding.Mesh):
                # The state really lives across all 8 devices.
                n_dev = len(
                    srv._detector._state.buffer.sharding.device_set
                )
                assert n_dev == len(jax.devices())
            host, port = srv.address
            with DetectionClient(host, port) as ca, \
                    DetectionClient(host, port) as cb:
                slots_a = [ca.open_stream() for _ in range(4)]
                slots_b = [cb.open_stream() for _ in range(4)]
                opened = slots_a + slots_b
                assert sorted(opened) == list(range(self.N_STREAMS))

                def feed(t0, t1, skip=()):
                    for t in range(t0, t1):
                        for k, sid in enumerate(opened):
                            if sid in skip:
                                continue
                            client = ca if sid in slots_a else cb
                            client.send_audio(
                                sid, waves[k][t * CHUNK : (t + 1) * CHUNK]
                            )

                # Phase 1: all 8 lanes in lockstep.
                feed(0, half)
                assert _wait(lambda: srv.stats()["ticks"] >= half)
                # Phase 2: mute slot_a[2] mid-stream via THRESH (crosses
                # the sharded per-lane threshold vector), then feed on.
                ca.set_threshold(slots_a[2], 1.1)
                feed(half, n_chunks)
                assert _wait(lambda: srv.stats()["ticks"] >= n_chunks)
                # Phase 3: slot reuse scrub across sharded state — close
                # one fully-drained slot, reopen it (same id: both
                # backends allocate deterministically) and replay a
                # cough through the recycled lane.
                victim = slots_b[1]
                cb.close_stream(victim)
                assert _wait(
                    lambda: srv.stats()["open_streams"]
                    == self.N_STREAMS - 1
                )
                reopened = cb.open_stream()
                assert reopened == victim
                idx = opened.index(victim)
                for t in range(n_chunks):
                    for k, sid in enumerate(opened):
                        client = ca if sid in slots_a else cb
                        client.send_audio(
                            sid, waves[k][t * CHUNK : (t + 1) * CHUNK]
                        )
                assert _wait(
                    lambda: srv.stats()["ticks"] >= 2 * n_chunks
                )
                # events() drains ALL of a client's slots at once; group
                # by stream id. Drain until the stream SETTLES (an empty
                # 1 s read): ticks "delivered" means events reached the
                # server-side outboxes, but the writer and client reader
                # threads may still be moving them under host load — a
                # single drain under-reads and the two scenario runs
                # under-read DIFFERENTLY, flaking the parity assert.
                for sid in opened:
                    events[sid] = []
                for client, timeout in ((ca, 5.0), (cb, 2.0)):
                    got = client.events(timeout=timeout)
                    while True:
                        more = client.events(timeout=1.0)
                        if not more:
                            break
                        got.extend(more)
                    for e in got:
                        events[e["stream"]].append(
                            (e["stream"], e["time"], e["confidence"])
                        )
        return events, slots_a[2], victim

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_daemon_mesh_event_parity(self, model_and_config, backend):
        if backend == "native":
            from cough_detector_tpu.serve import native_ingest

            if not native_ingest.available():
                pytest.skip("no native toolchain")
        from cough_detector_tpu.parallel import make_mesh

        mesh = make_mesh(axis="stream")
        single, muted_s, victim_s = self._scenario(
            model_and_config, backend, False
        )
        sharded, muted_m, victim_m = self._scenario(
            model_and_config, backend, mesh
        )
        assert muted_s == muted_m and victim_s == victim_m
        assert set(single) == set(sharded)
        total = 0
        for sid in single:
            evs_s, evs_m = single[sid], sharded[sid]
            assert len(evs_s) == len(evs_m), (
                f"slot {sid}: {len(evs_s)} single-device events vs "
                f"{len(evs_m)} over the mesh"
            )
            for a, b in zip(evs_s, evs_m):
                assert a[0] == b[0] == sid
                assert b[1] == pytest.approx(a[1], abs=1e-6)
                assert b[2] == pytest.approx(a[2], rel=1e-5)
            total += len(evs_s)
        assert total > 0, "threshold 0 must fire"

    def test_daemon_auto_mesh_is_the_default_multi_device_path(
        self, model_and_config
    ):
        """mesh=None (the production default) must auto-shard on this
        multi-device host — the exact path no r3 test ever executed."""
        variables, cfg = model_and_config
        srv = DetectionServer(
            variables=variables, config=cfg,
            num_streams=self.N_STREAMS, chunk_size=CHUNK,
            confidence_threshold=0.0, tick_policy="eager",
            backend="python",
        )
        with srv:
            assert srv._detector.mesh is not None
            n_dev = len(srv._detector._state.buffer.sharding.device_set)
            assert n_dev == len(jax.devices())
            host, port = srv.address
            with DetectionClient(host, port) as c:
                sid = c.open_stream()
                wave = synth.synthetic_cough(3, 1.5)
                n = wave.size // CHUNK
                for t in range(n):
                    c.send_audio(sid, wave[t * CHUNK : (t + 1) * CHUNK])
                assert _wait(lambda: srv.stats()["ticks"] >= n)
                assert c.events(timeout=5.0)
