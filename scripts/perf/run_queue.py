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

# (name, argv) — ordered cheapest-compile-first: stage-isolated jits
# compile far more reliably than the big fused fwd+bwd graph (verify
# SKILL.md), identical sub-jits (scene gen, precompute) land in the
# persistent cache for later stages, and the most expensive compile
# ('total') runs last when everything it can reuse is already cached.
QUEUE = [
    ("expand_g1", [f"{HERE}/sweep_expand_sw.py", "512", "512", "1"]),
    ("expand_g8", [f"{HERE}/sweep_expand_sw.py", "512", "512", "8"]),
    ("expand_s1024g8", [f"{HERE}/sweep_expand_sw.py", "1024", "512", "8"]),
    ("expand_s1024g16", [f"{HERE}/sweep_expand_sw.py", "1024", "256", "16"]),
    ("exchange_skew", [f"{HERE}/exchange_skew.py"]),
    ("params_bwd", [f"{HERE}/prof_backward.py", "params"]),
    ("rast_bwd", [f"{HERE}/prof_backward.py", "rast"]),
    ("reduce_rowgather", [f"{HERE}/prof_backward.py", "reduce", "rowgather"]),
    ("fwd", [f"{HERE}/prof_backward.py", "fwd"]),
    ("sharded_single", [f"{HERE}/sharded_overhead.py", "single"]),
    ("sharded_1dev", [f"{HERE}/sharded_overhead.py", "sharded"]),
    ("total_rowgather", [f"{HERE}/prof_backward.py", "total", "rowgather"]),
]


# overridable for the wedge-simulation test (tests/test_run_queue.py):
# the production probe grabs the real TPU, the test substitutes a fast
# or never-returning command
PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "print(float((jnp.ones((8,128))+1.0).sum()))"
)
POLL_S = 10.0


def wait_healthy(log, max_wait_s: float = 1800.0) -> bool:
    """Wait for a trivial TPU dispatch to complete, without killing it.

    A `timeout`-killed TPU process is itself the documented wedge
    trigger (verify SKILL.md), so the probe is NON-KILLING: one probe
    subprocess is spawned and polled until it finishes — however long a
    wedge delays it — and counts as healthy whenever it completes with
    rc 0. Only if the global max_wait_s budget is exhausted is the
    probe killed (once), and the queue aborts anyway at that point.
    """
    code = PROBE_CODE
    t0 = time.time()
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    logged = False
    while time.time() - t0 < max_wait_s:
        rc = p.poll()
        if rc is not None:
            if rc == 0:
                return True
            # probe crashed (not wedged) — retry with a fresh one
            log.write(f"probe exited rc={rc}; retrying in {3 * POLL_S:.0f} s\n")
            log.flush()
            time.sleep(3 * POLL_S)
            p = subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            continue
        if time.time() - t0 > 6 * POLL_S and not logged:
            log.write("probe still running: device wedged, "
                      "waiting for it to complete (non-killing)\n")
            log.flush()
            logged = True
        time.sleep(POLL_S)
    p.kill()
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/perf_queue.log")
    ap.add_argument("--stages-file", default=None,
                    help="JSON file: list of [name, argv] stages to run "
                         "instead of the built-in QUEUE")
    ap.add_argument("--probe-max-wait", type=float, default=1800.0,
                    help="max seconds to wait for a health probe before "
                         "aborting the queue (wedge budget)")
    ap.add_argument("--stage-timeout", type=float, default=3600.0,
                    help="per-stage wall limit. Generous on purpose: "
                         "degraded windows compile the 6M frame in "
                         "10-40 min, and a compile that COMPLETES lands "
                         "in the persistent cache while a killed one "
                         "wastes the wait AND re-wedges the device")
    args = ap.parse_args()

    queue = QUEUE
    if args.stages_file:
        import json

        queue = [tuple(s) for s in json.load(open(args.stages_file))]

    with open(args.log, "a") as log:
        log.write(f"\n=== perf queue run {time.strftime('%F %T')} ===\n")
        for name, argv in queue:
            if not wait_healthy(log, args.probe_max_wait):
                # a dead tunnel stays dead for every remaining stage;
                # abort the whole queue rather than cycling probes
                log.write(f"{name}: device never became healthy — "
                          f"ABORTING remaining stages\n")
                log.flush()
                break
            log.write(f"--- {name}: {' '.join(argv)}\n")
            log.flush()
            t0 = time.time()
            # child output streams to its own file (NOT a pipe): during
            # a degraded-window stage the incremental compile/progress
            # lines are the diagnostic that distinguishes slow-compile
            # from wedge, and they survive a timeout kill
            stage_log = f"{args.log}.{name}"
            try:
                with open(stage_log, "a") as sl:
                    r = subprocess.run(
                        [sys.executable, "-u", *argv],
                        stdout=sl, stderr=subprocess.STDOUT,
                        timeout=args.stage_timeout,
                    )
                tail = open(stage_log).read()[-2000:]
                log.write(tail)
                if r.returncode != 0:
                    log.write(f"{name}: EXIT {r.returncode}\n")
            except subprocess.TimeoutExpired:
                tail = ""
                try:
                    tail = open(stage_log).read()[-1500:]
                except OSError:
                    pass
                log.write(f"{name}: TIMEOUT after "
                          f"{time.time() - t0:.0f}s (killed; next stage "
                          f"waits for recovery)\n"
                          f"  partial output: {tail}\n")
            log.write(f"{name}: {time.time() - t0:.0f}s wall\n")
            log.flush()
        log.write("=== queue done ===\n")


if __name__ == "__main__":
    main()
