"""Driver-contract smoke tests for bench.py — the file the driver runs on
real hardware every round. Executed here on the CPU mesh at tiny sizes:
what's checked is that both benchmark paths run end-to-end and emit the
promised single-line JSON schema, not the numbers."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "sys.argv = ['bench.py'] + %r\n"
            "import runpy\n"
            "runpy.run_path(%r, run_name='__main__')\n"
            % (REPO, args, os.path.join(REPO, "bench.py")),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [
        l for l in proc.stdout.strip().splitlines() if l.startswith("{")
    ]
    assert lines, proc.stdout
    return [json.loads(l) for l in lines]


def test_headline_schema():
    (rec,) = _run(["--batch", "64"])
    assert rec["metric"] == "1s_clips_per_sec_per_chip_end_to_end"
    assert rec["unit"] == "clips/s/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 10_000.0, 3)


def test_headline_fresh_h2d_schema():
    """--fresh-h2d adds the ingest-inclusive row (r4 VERDICT #5): a
    second JSON line whose timed region device_puts a fresh int16 batch
    per iteration."""
    recs = _run(["--batch", "64", "--fresh-h2d"])
    assert len(recs) == 2
    rec = recs[1]
    assert rec["metric"] == "1s_clips_per_sec_per_chip_ingest_inclusive"
    assert rec["unit"] == "clips/s/chip"
    assert rec["value"] > 0
    assert rec["batch"] == 64
    assert rec["h2d_bytes_per_iter"] == 64 * 16000 * 2


def test_serving_schema():
    (rec,) = _run(["--serving", "--streams", "8"])
    assert rec["metric"] == "multi_stream_serving"
    assert rec["num_streams"] == 8
    assert rec["sustained_tick_ms"] > 0
    assert isinstance(rec["realtime_at_this_count"], bool)
    assert rec["derived_stream_capacity_per_chip"] > 0
