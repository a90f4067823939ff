"""Wedge-simulation tests for the TPU measurement queue harness
(scripts/perf/run_queue.py; VERDICT r4 item 8).

The round-4 concern: the queue's recovery logic (non-killing probes,
single abort, timeout tail capture) had never been exercised under a
real degraded window. These tests fake the two failure modes on CPU —
a hanging measurement child and a wedged (never-returning) health
probe — and assert the exact recovery behavior the docstrings promise,
so a real TPU window is never gambled on untested paths.

No TPU, no jax: children are plain python sleeps, probes are overridden
via run_queue.PROBE_CODE.
"""

import importlib.util
import json
import sys


def _load_run_queue():
    spec = importlib.util.spec_from_file_location(
        "run_queue", "/root/repo/scripts/perf/run_queue.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(mod, argv):
    old = sys.argv
    sys.argv = ["run_queue.py", *argv]
    try:
        mod.main()
    finally:
        sys.argv = old


def test_timeout_tail_capture_and_recovery(tmp_path):
    """A hanging stage is killed at --stage-timeout with its partial
    output captured in the log, the (fast) probe then reports healthy,
    and the NEXT stage still runs to completion — one bad stage must
    not abort the queue."""
    mod = _load_run_queue()
    mod.PROBE_CODE = "print('ok')"  # healthy CPU probe, instant
    mod.POLL_S = 0.1

    stages = [
        ["hang", [
            "-c",
            "import sys, time; print('started-before-hang', flush=True);"
            "time.sleep(600)",
        ]],
        ["good", ["-c", "print('good-stage-ran')"]],
    ]
    sf = tmp_path / "stages.json"
    sf.write_text(json.dumps(stages))
    log = tmp_path / "q.log"

    _run_main(mod, ["--stages-file", str(sf), "--log", str(log),
                    "--stage-timeout", "2", "--probe-max-wait", "5"])

    text = log.read_text()
    assert "hang: TIMEOUT after" in text
    # the tail of the killed child's output survives (the diagnostic
    # that distinguishes slow-compile from wedge)
    assert "started-before-hang" in text
    assert "good-stage-ran" in text
    assert "=== queue done ===" in text
    assert "ABORTING" not in text


def test_wedged_probe_aborts_once_without_probe_pileup(tmp_path):
    """A probe that never returns (wedged device) makes the queue abort
    the REMAINING stages after the --probe-max-wait budget — exactly one
    abort, no stage is started, and no probe-kill cycle (a single probe
    process is polled, then killed once at the budget)."""
    mod = _load_run_queue()
    mod.PROBE_CODE = "import time; time.sleep(600)"  # wedge: never healthy
    mod.POLL_S = 0.1

    stages = [
        ["never_a", ["-c", "print('must-not-run-a')"]],
        ["never_b", ["-c", "print('must-not-run-b')"]],
    ]
    sf = tmp_path / "stages.json"
    sf.write_text(json.dumps(stages))
    log = tmp_path / "q.log"

    _run_main(mod, ["--stages-file", str(sf), "--log", str(log),
                    "--stage-timeout", "2", "--probe-max-wait", "2"])

    text = log.read_text()
    assert text.count("ABORTING remaining stages") == 1
    assert "must-not-run-a" not in text
    assert "must-not-run-b" not in text
    # the non-killing path logged that it was waiting, not cycling kills
    assert "waiting for it to complete (non-killing)" in text
    assert "=== queue done ===" in text


def test_probe_crash_retries_then_recovers(tmp_path):
    """A probe that CRASHES (rc != 0, e.g. a transient tunnel error) is
    retried with a fresh probe rather than treated as a wedge; once a
    retry succeeds the queue proceeds."""
    mod = _load_run_queue()
    # crash on first spawn, succeed afterwards (marker file flips it)
    marker = tmp_path / "probe_ran_once"
    mod.PROBE_CODE = (
        "import pathlib, sys;"
        f"m = pathlib.Path({str(marker)!r});"
        "sys.exit(0) if m.exists() else (m.touch(), sys.exit(3))"
    )
    mod.POLL_S = 0.05

    stages = [["good", ["-c", "print('good-after-retry')"]]]
    sf = tmp_path / "stages.json"
    sf.write_text(json.dumps(stages))
    log = tmp_path / "q.log"

    _run_main(mod, ["--stages-file", str(sf), "--log", str(log),
                    "--stage-timeout", "5", "--probe-max-wait", "10"])

    text = log.read_text()
    assert "probe exited rc=3; retrying" in text
    assert "good-after-retry" in text
    assert "ABORTING" not in text
