"""Process-level kill/resume: a `ray job`-style CLI run is SIGKILLed
mid-flight, then resumed; the resumed run must skip committed shards and
produce aggregates identical to an uninterrupted run (north rule)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

ROWS = 400
FILES = 8


def run_cli(*args, **kw):
    # hard timeout: under heavy VM contention a child Ray instance can
    # crawl indefinitely; fail loudly rather than wedge the suite
    kw.setdefault("timeout", 400)
    return subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_symbolicator_ray", *args],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        **kw,
    )


@pytest.mark.timeout(500)
def test_kill_and_resume(tmp_path):
    corpus = str(tmp_path / "corpus")
    out_fresh = str(tmp_path / "fresh")
    out_killed = str(tmp_path / "killed")

    r = run_cli("synth", "--out", corpus, "--rows", str(ROWS), "--files", str(FILES))
    assert r.returncode == 0, r.stderr

    # Uninterrupted reference run.
    r = run_cli("run", "--input", corpus, "--output", out_fresh, "--shard-size", "1")
    assert r.returncode == 0, r.stderr
    fresh = json.loads(r.stdout.strip().splitlines()[-1])

    # Start a run and SIGKILL it once at least one shard has committed.
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "opentelemetry_collector_symbolicator_ray",
            "run", "--input", corpus, "--output", out_killed, "--shard-size", "1",
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    manifest_dir = os.path.join(out_killed, "manifest")
    deadline = time.monotonic() + 240
    committed = 0
    while time.monotonic() < deadline:
        committed = len(
            [f for f in os.listdir(manifest_dir)] if os.path.isdir(manifest_dir) else []
        )
        if committed >= 1 or proc.poll() is not None:
            break
        time.sleep(0.25)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    assert committed >= 1, "run finished or died before any shard committed"

    committed_before = sorted(os.listdir(manifest_dir))
    mtimes_before = {
        f: os.path.getmtime(os.path.join(manifest_dir, f)) for f in committed_before
        if f.endswith(".json")
    }

    # Resume: completes the remaining shards without touching committed ones.
    r = run_cli("run", "--input", corpus, "--output", out_killed, "--shard-size", "1")
    assert r.returncode == 0, r.stderr
    resumed = json.loads(r.stdout.strip().splitlines()[-1])

    for f, mtime in mtimes_before.items():
        assert os.path.getmtime(os.path.join(manifest_dir, f)) == mtime, (
            f"committed shard {f} was reprocessed"
        )

    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import drop_telemetry

    assert drop_telemetry(resumed) == drop_telemetry(fresh)
