"""Streaming tests: ring-buffer mechanics, streaming-vs-offline window
equivalence (SURVEY.md §4 strategy #4), smoothing/debounce semantics,
multi-stream batching, and API-compat wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cough_detector_tpu.config import Config, FeatureConfig, StreamConfig
from cough_detector_tpu.data import synth
from cough_detector_tpu.models import create_model, init_model
from cough_detector_tpu.stream import (
    StreamingDetector,
    init_state,
    make_stream_step,
)
from cough_detector_tpu.stream import ring

FCFG = FeatureConfig()


def _mean_score_step(stream_cfg, chunk=1600, num_streams=2):
    """Stream step whose score_fn just returns the window mean — lets the
    window-extraction logic be checked exactly."""
    captured = []

    def score_fn(windows):
        return jnp.mean(windows, axis=1)

    step = make_stream_step(score_fn, FCFG, stream_cfg, chunk)
    state = init_state(
        num_streams, chunk, 16000, stream_cfg.smoothing_window,
        stream_cfg.confidence_threshold,
    )
    return step, state


class TestRingBuffer:
    def test_streaming_matches_offline_slicing(self):
        """Feeding a long signal in 100 ms chunks must emit exactly the
        windows offline slicing would produce (window 1 s, hop 0.25 s)."""
        cfg = StreamConfig(confidence_threshold=2.0)  # never fire
        step, state = _mean_score_step(cfg, chunk=1600, num_streams=2)

        rng = np.random.default_rng(0)
        total = 16000 * 3
        signal = rng.standard_normal((2, total)).astype(np.float32)

        got = []
        for i in range(total // 1600):
            state, ev = step(state, jnp.asarray(signal[:, i * 1600 : (i + 1) * 1600]))
            valid = np.asarray(ev["valid"])
            for k in np.nonzero(valid)[0]:
                got.append(np.asarray(ev["probs"])[:, k])

        want = []
        pos = 0
        while pos + 16000 <= total:
            want.append(signal[:, pos : pos + 16000].mean(axis=1))
            pos += 4000
        assert len(got) == len(want), (len(got), len(want))
        np.testing.assert_allclose(np.stack(got), np.stack(want), atol=1e-5)

    def test_timestamps_are_window_ends(self):
        cfg = StreamConfig(confidence_threshold=2.0)
        step, state = _mean_score_step(cfg)
        times = []
        for i in range(32):
            chunk = jnp.ones((2, 1600))
            state, ev = step(state, chunk)
            valid = np.asarray(ev["valid"])
            for k in np.nonzero(valid)[0]:
                times.append(float(np.asarray(ev["timestamps"])[k]))
        # First window ends at 1.0 s; each next 0.25 s later.
        np.testing.assert_allclose(
            times, 1.0 + 0.25 * np.arange(len(times)), atol=1e-6
        )

    def test_large_chunk_multiple_windows(self):
        """A chunk bigger than the hop can complete several windows."""
        cfg = StreamConfig(confidence_threshold=2.0)
        step, state = _mean_score_step(cfg, chunk=16000, num_streams=1)
        # First chunk fills exactly one window.
        state, ev = step(state, jnp.ones((1, 16000)))
        assert int(np.asarray(ev["valid"]).sum()) == 1
        # Second 16000 chunk advances 4 hops.
        state, ev = step(state, jnp.ones((1, 16000)))
        assert int(np.asarray(ev["valid"]).sum()) == 4


class TestSmoothingDebounce:
    def test_smoothing_is_running_mean(self):
        cfg = StreamConfig(confidence_threshold=2.0, smoothing_window=3)
        step, state = _mean_score_step(cfg, chunk=4000, num_streams=1)
        # Constant signal of value v → window mean v; smoothed values must
        # follow deque(maxlen=3).mean() over successive identical windows.
        vals = []
        for i in range(8):
            state, ev = step(state, jnp.full((1, 4000), float(i)))
            valid = np.asarray(ev["valid"])
            for k in np.nonzero(valid)[0]:
                vals.append(
                    (float(np.asarray(ev["probs"])[0, k]),
                     float(np.asarray(ev["smoothed"])[0, k]))
                )
        # reproduce with a deque
        from collections import deque

        hist = deque(maxlen=3)
        for prob, smoothed in vals:
            hist.append(prob)
            assert abs(smoothed - np.mean(hist)) < 1e-5

    def test_scrubbed_lane_smoothing_restarts_empty(self):
        """A lane scrubbed on slot reuse (detector.reset_streams zeroes its
        buffer, history AND per-lane history_len) restarts its smoothing
        deque EMPTY: the first window after reuse averages only itself —
        no injected-zero dilution — while other lanes keep their full
        running mean. Guards the per-lane history_len semantics."""
        cfg = StreamConfig(confidence_threshold=2.0, smoothing_window=3)
        step, state = _mean_score_step(cfg, chunk=4000, num_streams=2)
        for _ in range(6):  # saturate both lanes' deques (3 windows)
            state, _ = step(state, jnp.full((2, 4000), 1.0))
        mask = jnp.asarray([True, False])  # scrub lane 0, as reset_streams
        state = state._replace(
            buffer=jnp.where(mask[:, None], 0.0, state.buffer),
            history=jnp.where(mask[:, None], 0.0, state.history),
            history_len=jnp.where(mask, 0, state.history_len),
        )
        state, ev = step(state, jnp.full((2, 4000), 0.5))
        k = int(np.nonzero(np.asarray(ev["valid"]))[0][0])
        sm = np.asarray(ev["smoothed"])
        # lane 0: window mean = 4000*0.5/16000 = 0.125 over a deque of ONE
        # (the buggy shared-length average would read (0+0+0.125)/3).
        assert sm[0, k] == pytest.approx(0.125, abs=1e-6)
        # lane 1: running 3-mean over (1, 1, 0.875).
        assert sm[1, k] == pytest.approx((1 + 1 + 0.875) / 3, abs=1e-6)

    def test_debounce_blocks_rapid_fires(self):
        cfg = StreamConfig(
            confidence_threshold=0.5, smoothing_window=1, debounce_seconds=0.6
        )
        step, state = _mean_score_step(cfg, chunk=4000, num_streams=1)
        fire_times = []
        for i in range(16):
            state, ev = step(state, jnp.ones((1, 4000)))  # mean 1.0 > 0.5
            fired = np.asarray(ev["fired"])
            for k in np.nonzero(np.asarray(ev["valid"]))[0]:
                if fired[0, k]:
                    fire_times.append(float(np.asarray(ev["timestamps"])[k]))
        assert len(fire_times) >= 2
        gaps = np.diff(fire_times)
        assert (gaps >= 0.6 - 1e-6).all(), gaps

    def test_per_stream_independent_debounce(self):
        cfg = StreamConfig(
            confidence_threshold=0.5, smoothing_window=1, debounce_seconds=10.0
        )

        def score_fn(windows):
            # stream 0 hot, stream 1 cold
            return jnp.stack([jnp.asarray(1.0), jnp.asarray(0.0)])

        step = jax.jit(
            lambda s, c: ring.stream_step(
                s, c, score_fn, window_samples=16000, hop_samples=4000,
                sample_rate=16000,
                debounce_seconds=10.0,
            )
        )
        state = init_state(2, 4000, 16000, 1, 0.5)
        fires = np.zeros(2, int)
        for i in range(12):
            state, ev = step(state, jnp.zeros((2, 4000)))
            fired = np.asarray(ev["fired"])
            valid = np.asarray(ev["valid"])
            fires += (fired[:, valid]).sum(axis=1)
        assert fires[0] == 1  # debounced after first
        assert fires[1] == 0


def _trained_like_variables():
    cfg = Config.from_flat_dict({"model_type": "small"})
    model = create_model("small")
    variables = init_model(model, jax.random.PRNGKey(0), cfg.features.feature_shape)
    return variables, cfg


class TestStreamingDetector:
    def test_multi_stream_detections_shape(self):
        variables, cfg = _trained_like_variables()
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=4,
            chunk_size=1600, confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0,
        )
        chunk = synth.fixture_batch(4, 1.0, seed=1)
        dets = det.process_chunk(chunk)  # 1 s: completes first window
        # threshold 0 → every stream fires on the first window
        assert {d.stream for d in dets} == {0, 1, 2, 3}
        assert all(abs(d.time_seconds - 1.0) < 1e-6 for d in dets)

    def test_reset_clears_state(self):
        variables, cfg = _trained_like_variables()
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            confidence_threshold=0.0, smoothing_window=1, debounce_seconds=0.0,
        )
        w = synth.synthetic_cough(0, 1.0)[None]
        first = det.process_chunk(w)
        det.reset()
        second = det.process_chunk(w)
        assert [d.time_seconds for d in first] == [d.time_seconds for d in second]

    def test_set_thresholds_mid_stream_preserves_state(self):
        """set_thresholds changes sensitivity WITHOUT a scrub: ring
        audio, smoothing history and the debounce clock all survive —
        unlike reset_streams, whose job is tenant isolation."""
        variables, cfg = _trained_like_variables()
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=2,
            chunk_size=1600, confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0,
        )
        w = synth.fixture_batch(2, 3.0, seed=2)
        # Phase 1 (default 0.0): both lanes fire.
        d1 = det.process_chunk(w[:, :16000])
        assert {d.stream for d in d1} == {0, 1}
        # Host snapshots BEFORE the update (the jitted setter donates the
        # state tree, so the old device arrays are consumed).
        buffer_before = np.asarray(det._state.buffer)
        last_fire_before = np.asarray(det._state.last_fire_window)
        # Phase 2: mute lane 1 only, mid-stream.
        det.set_thresholds([1], [1.1])
        np.testing.assert_array_equal(
            det.current_thresholds(),
            np.asarray([0.0, 1.1], np.float32),
        )
        # Nothing but the threshold row changed: no scrub happened.
        np.testing.assert_array_equal(
            np.asarray(det._state.buffer), buffer_before
        )
        np.testing.assert_array_equal(
            np.asarray(det._state.last_fire_window), last_fire_before
        )
        d2 = det.process_chunk(w[:, 16000:32000])
        assert {d.stream for d in d2} == {0}
        # Phase 3: None restores the configured default; lane 1 resumes.
        det.set_thresholds([1], [None])
        d3 = det.process_chunk(w[:, 32000:48000])
        assert {d.stream for d in d3} == {0, 1}

    def test_uneven_chunks_buffered(self):
        variables, cfg = _trained_like_variables()
        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=1600, confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0,
        )
        w = synth.synthetic_cough(0, 2.0)
        dets = []
        # Feed in awkward 700-sample pieces.
        for i in range(0, 32000 - 700, 700):
            dets += det.process_chunk(w[i : i + 700])
        assert len(dets) >= 4  # 2 s → windows at 1.0, 1.25, 1.5, 1.75...


class TestReferenceAPIWrapper:
    def test_process_audio_chunk_api(self, tmp_path):
        from cough_detector_tpu.stream import CoughDetectorInference
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        variables, cfg = _trained_like_variables()
        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)

        eng = CoughDetectorInference(
            str(pt), confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0, verbose=False,
        )
        fired = []
        eng.on_cough_detected = lambda ts, conf: fired.append(conf)
        result = None
        w = synth.synthetic_cough(3, 1.5)
        for i in range(0, 24000 - 1600, 1600):
            r = eng.process_audio_chunk(w[i : i + 1600])
            result = r or result
        assert result is not None
        assert fired and 0.0 <= fired[0] <= 1.0

    def test_confidence_threshold_is_live_mutable(self, tmp_path):
        """The reference reads self.confidence_threshold at event time
        (src/inference.py:70,229), so users mutate it live; the facade
        must honor that — the new value applies from the next window,
        with stream state intact."""
        from cough_detector_tpu.stream import CoughDetectorInference
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        variables, cfg = _trained_like_variables()
        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        eng = CoughDetectorInference(
            str(pt), confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0, verbose=False,
        )
        w = synth.synthetic_cough(3, 3.0)
        hits = [
            eng.process_audio_chunk(w[i : i + 1600]) is not None
            for i in range(0, 16000, 1600)
        ]
        assert any(hits)  # threshold 0: fires once windows complete
        eng.confidence_threshold = 1.1  # live mutation, reference-style
        assert eng.confidence_threshold == 1.1
        hits2 = [
            eng.process_audio_chunk(w[i : i + 1600]) is not None
            for i in range(16000, 32000, 1600)
        ]
        assert not any(hits2)
        eng.confidence_threshold = 0.0
        hits3 = [
            eng.process_audio_chunk(w[i : i + 1600]) is not None
            for i in range(32000, 48000, 1600)
        ]
        assert any(hits3)

    def test_live_threshold_survives_reset(self, tmp_path):
        """r4 review: reset() clears audio/history state but must NOT
        revert a live-mutated threshold — the reference's reset() never
        touches the attribute (src/inference.py), while our engine
        re-inits lane thresholds from the constructor config. The
        wrapper re-applies the mutated value after reset."""
        from cough_detector_tpu.stream import CoughDetectorInference
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        variables, cfg = _trained_like_variables()
        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        eng = CoughDetectorInference(
            str(pt), confidence_threshold=0.0, smoothing_window=1,
            debounce_seconds=0.0, verbose=False,
        )
        eng.confidence_threshold = 1.1  # nothing can clear 1.1
        eng.reset()
        assert eng.confidence_threshold == 1.1
        w = synth.synthetic_cough(3, 2.0)
        hits = [
            eng.process_audio_chunk(w[i : i + 1600]) is not None
            for i in range(0, 32000, 1600)
        ]
        assert not any(hits)  # engine lane still at 1.1, not ctor's 0.0

    def test_predict_feature_tensor(self, tmp_path):
        from cough_detector_tpu.stream import CoughDetectorInference
        from cough_detector_tpu.train.checkpoint import export_torch_checkpoint

        variables, cfg = _trained_like_variables()
        pt = tmp_path / "m.pt"
        export_torch_checkpoint(str(pt), variables, cfg)
        eng = CoughDetectorInference(str(pt), verbose=False)
        feats = np.random.default_rng(0).standard_normal((1, 90, 101)).astype(np.float32)
        is_cough, p = eng.predict(feats)
        assert isinstance(is_cough, bool) or is_cough in (True, False)
        assert 0.0 <= p <= 1.0
        # The jitted predict path (r4 VERDICT #5) must equal the eager
        # apply exactly, and repeated same-shape calls reuse ONE program.
        import jax as _jax

        eager = float(_jax.nn.softmax(
            eng._engine._model.apply(
                eng._engine._variables, feats[None], train=False
            ), axis=-1,
        )[0, 1])
        assert p == pytest.approx(eager, abs=1e-6)
        _, p2 = eng.predict(feats)
        assert p2 == p
        assert eng._predict_jit._cache_size() == 1


class TestOfflineScoring:
    def test_matches_streaming_detector(self):
        """Offline batched scoring must emit the same detections as feeding
        the same recording through the streaming ring buffer."""
        from cough_detector_tpu.stream import offline

        variables, cfg = _trained_like_variables()
        wave = np.concatenate(
            [synth.synthetic_cough(i, 1.0) for i in range(5)]
        )  # 5 s

        dets_off = offline.score_recording(
            wave, variables, cfg,
            hop_duration=0.25, threshold=0.0, smoothing_window=3,
            debounce_seconds=0.5,
        )

        det = StreamingDetector(
            variables=variables, config=cfg, num_streams=1,
            chunk_size=1600, confidence_threshold=0.0, smoothing_window=3,
            debounce_seconds=0.5,
        )
        dets_stream = det.process_chunk(wave[None])

        assert len(dets_off) == len(dets_stream)
        for a, b in zip(dets_off, dets_stream):
            assert abs(a.time_seconds - b.time_seconds) < 1e-6
            assert abs(a.confidence - b.confidence) < 1e-4

    def test_frame_windows_geometry(self):
        from cough_detector_tpu.stream.offline import frame_windows
        import jax.numpy as jnp

        w = jnp.arange(16000 * 2, dtype=jnp.float32)
        f = frame_windows(w, 16000, 4000)
        assert f.shape == (5, 16000)
        assert float(f[1, 0]) == 4000.0

    def test_short_recording_no_windows(self):
        from cough_detector_tpu.stream.offline import frame_windows
        import jax.numpy as jnp

        f = frame_windows(jnp.zeros(1000), 16000, 4000)
        assert f.shape == (0, 16000)


class TestMicListener:
    """The capture→queue→worker→sink loop driven end-to-end by the
    in-memory ArrayCapture adapter — no PortAudio, no hardware
    (VERDICT r1 §next-5: original mic layer, fake-backend coverage)."""

    class _StubEngine:
        """Duck-typed inference engine: 'detects' any block peaking >0.5."""

        def __init__(self):
            self.resets = 0
            self.blocks = []

        def reset(self):
            self.resets += 1

        def process_audio_chunk(self, samples):
            import datetime

            self.blocks.append(len(samples))
            if np.abs(samples).max() > 0.5:
                return datetime.datetime.now(), float(np.abs(samples).max())
            return None

    def _listener(self, wave, **kw):
        from cough_detector_tpu.stream.mic import (
            ArrayCapture,
            RealtimeMicrophoneDetector,
        )

        engine = self._StubEngine()
        cap = ArrayCapture(wave, block_size=1600)
        det = RealtimeMicrophoneDetector(engine, capture=cap, **kw)
        return det, engine

    def test_detections_flow_to_callback_and_all_audio_scored(self):
        wave = np.zeros(16000, np.float32)
        wave[6400:8000] = 0.9  # exactly one loud block
        det, engine = self._listener(wave)
        hits = []
        det.on_detection = lambda when, conf: hits.append((when, conf))

        det.start()
        det.drain_until_idle()
        det.stop()

        assert engine.resets == 1
        assert sum(engine.blocks) == 16000  # every sample reached the engine
        assert len(hits) == 1
        assert hits[0][1] == pytest.approx(0.9)
        assert not det.running

    def test_engine_errors_are_recorded_not_fatal(self):
        class Exploding(self._StubEngine):
            def process_audio_chunk(self, samples):
                raise ValueError("boom")

        from cough_detector_tpu.stream.mic import (
            ArrayCapture,
            RealtimeMicrophoneDetector,
        )

        det = RealtimeMicrophoneDetector(
            Exploding(), capture=ArrayCapture(np.ones(4800, np.float32), 1600)
        )
        det.start()
        det.drain_until_idle()
        det.stop()
        assert len(det.errors) == 3  # one per block, loop survived

    def test_callback_errors_are_recorded_not_fatal(self):
        """A raising on_detection callback must not kill the drain
        worker: later blocks keep scoring and later detections still
        reach the sink (the worker previously died on the first raise
        while `running` kept reporting True)."""
        wave = np.zeros(16000, np.float32)
        wave[1600:3200] = 0.9   # loud block -> detection -> raising callback
        wave[12800:14400] = 0.8  # later loud block must STILL be detected
        det, engine = self._listener(wave)
        calls = []

        def exploding(when, conf):
            calls.append(conf)
            raise RuntimeError("user callback bug")

        det.on_detection = exploding
        det.start()
        det.drain_until_idle()
        det.stop()
        assert sum(engine.blocks) == 16000  # every block still scored
        assert len(calls) == 2  # the second detection was delivered too
        assert any("callback failed" in e for e in det.errors)

    def test_restart_does_not_double_drive_the_engine(self):
        """stop() then start(): exactly one worker drives the engine in
        the second session (a timed-out join once abandoned a live
        worker that a restart revived alongside the new one)."""
        wave = np.zeros(8000, np.float32)
        det, engine = self._listener(wave)
        det.start()
        det.drain_until_idle()
        det.stop()
        first_session = sum(engine.blocks)
        # ArrayCapture replays from the start on reopen.
        det.start()
        det.drain_until_idle()
        det.stop()
        assert engine.resets == 2
        assert sum(engine.blocks) == first_session + 8000  # no double feed

    def test_no_capture_stack_fails_loudly(self):
        from cough_detector_tpu.stream import mic

        if mic.SOUNDDEVICE_AVAILABLE or mic.PYAUDIO_AVAILABLE:
            pytest.skip("host has a real capture stack")
        with pytest.raises(RuntimeError, match="capture stack"):
            mic.RealtimeMicrophoneDetector(self._StubEngine())

    def test_backend_name_surfaces_adapter(self):
        det, _ = self._listener(np.zeros(1600, np.float32))
        assert det.backend == "array"
