"""Viewer-on-TPU latency series (VERDICT r4 item 4).

Starts apps/viewer.py on the REAL TPU, waits for warmup, then issues K
sequential /frame requests from distinct camera poses (a slow orbit, so
no request can be served from any cache) and records each end-to-end
latency — the interactive-session equivalent of the reference's live
ImGui FPS (app/display.cpp:138, main.cpp:317-320). End-to-end includes
the JPEG encode and the axon tunnel fetch (~109 ms RTT floor).

Usage: python -u scripts/perf/viewer_latency.py [n_gaussians] [K]
"""
import json
import math
import subprocess
import sys
import time
import urllib.request

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 12
PORT = 8791
W, H = 1280, 720

proc = subprocess.Popen(
    [sys.executable, "-u", "-m",
     "luisacomputegaussiansplatting_tpu.apps.viewer",
     "--synthetic", str(N), "--res", f"{W}x{H}", "--port", str(PORT),
     "--max-pairs", "4500000"],
    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    cwd="/root/repo",
)
print(f"viewer pid {proc.pid}", flush=True)

# wait for the warmup print (TPU compile can take minutes)
t0 = time.time()
ready = False
while time.time() - t0 < 1500:
    line = proc.stdout.readline()
    if not line:
        break
    print(f"  [viewer] {line.rstrip()}", flush=True)
    if "compiled in" in line or "viewing" in line:
        ready = True
        break
if not ready:
    proc.kill()
    sys.exit("viewer never became ready")

lat = []
try:
    for i in range(K):
        a = 0.3 + 0.07 * i  # slow orbit: every pose distinct
        pos = (3.6 * math.cos(a), 3.6 * math.sin(a), 2.0)
        q = (f"pos={pos[0]:.3f},{pos[1]:.3f},{pos[2]:.3f}"
             f"&front={-pos[0]:.3f},{-pos[1]:.3f},{-1.2:.3f}"
             f"&up=0,0,1&fov=65&bg=%23000000")
        t1 = time.time()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/frame?{q}", timeout=600) as r:
            body = r.read()
        dt = time.time() - t1
        lat.append(dt * 1e3)
        print(f"frame {i}: {dt * 1e3:.0f} ms  ({len(body)} B jpeg)",
              flush=True)
finally:
    proc.kill()
    proc.wait()

lat_sorted = sorted(lat)
med = lat_sorted[len(lat) // 2]
# steady-state = drop the first (post-warmup residual compile/caching)
steady = lat[1:] or lat
print(json.dumps({
    "n_gaussians": N, "res": f"{W}x{H}", "k": K,
    "latency_ms": [round(v) for v in lat],
    "median_ms": round(med),
    "steady_mean_ms": round(sum(steady) / len(steady)),
    "fps_at_median": round(1000.0 / med, 2),
}), flush=True)
