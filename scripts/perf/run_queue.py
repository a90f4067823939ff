"""Run the queued TPU measurements in one window, wedge-aware.

Executes the BASELINE.md-queued measurement set sequentially (one
subprocess per measurement, per the axon reliability rules in
.claude/skills/verify/SKILL.md), with a trivial-op health probe between
stages: a `timeout`-killed TPU process can wedge the device for 5-20
min, so after any stage times out we probe-and-wait instead of piling
killed processes onto a wedged tunnel.

Usage:  python -u scripts/perf/run_queue.py [--log FILE] [--stage-timeout S]

Results (stdout tails) are appended to the log (default
/tmp/perf_queue.log) for transcription into BASELINE.md.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

HERE = "/root/repo/scripts/perf"

# (name, argv) — ordered so later stages reuse earlier compile-cache hits
QUEUE = [
    ("total_rowgather", [f"{HERE}/prof_backward.py", "total", "rowgather"]),
    ("fwd", [f"{HERE}/prof_backward.py", "fwd"]),
    ("rast_bwd", [f"{HERE}/prof_backward.py", "rast"]),
    ("reduce_rowgather", [f"{HERE}/prof_backward.py", "reduce", "rowgather"]),
    ("params_bwd", [f"{HERE}/prof_backward.py", "params"]),
    ("sharded_single", [f"{HERE}/sharded_overhead.py", "single"]),
    ("sharded_1dev", [f"{HERE}/sharded_overhead.py", "sharded"]),
    ("expand_s1024", [f"{HERE}/sweep_expand_sw.py", "1024", "128"]),
    ("expand_s2048", [f"{HERE}/sweep_expand_sw.py", "2048", "128"]),
]


def probe(timeout_s: float = 120.0) -> bool:
    """True if a trivial TPU dispatch completes within timeout_s."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print(float((jnp.ones((8,128))+1.0).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_healthy(log, max_wait_s: float = 1800.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if probe():
            return True
        log.write(f"probe failed; device wedged, waiting 120 s "
                  f"({time.time() - t0:.0f}s elapsed)\n")
        log.flush()
        time.sleep(120)
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/perf_queue.log")
    ap.add_argument("--stage-timeout", type=float, default=2400.0,
                    help="per-stage wall limit (degraded windows compile "
                         "the 6M frame in 10-30 min)")
    args = ap.parse_args()

    with open(args.log, "a") as log:
        log.write(f"\n=== perf queue run {time.strftime('%F %T')} ===\n")
        for name, argv in QUEUE:
            if not wait_healthy(log):
                log.write(f"{name}: SKIPPED (device never became healthy)\n")
                log.flush()
                continue
            log.write(f"--- {name}: {' '.join(argv)}\n")
            log.flush()
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-u", *argv],
                    capture_output=True, text=True,
                    timeout=args.stage_timeout,
                )
                log.write(r.stdout[-2000:])
                if r.returncode != 0:
                    log.write(f"{name}: EXIT {r.returncode}\n"
                              + r.stderr[-1000:])
            except subprocess.TimeoutExpired:
                log.write(f"{name}: TIMEOUT after "
                          f"{time.time() - t0:.0f}s (killed; next stage "
                          f"waits for recovery)\n")
            log.write(f"{name}: {time.time() - t0:.0f}s wall\n")
            log.flush()
        log.write("=== queue done ===\n")


if __name__ == "__main__":
    main()
