"""Host-parallelism calibration: is N-way process scaling even possible
on this machine *right now*?

The executor-scaling protocol (scaling_executors.py) compares 1 vs 4
concurrent 2-core JVMs.  On a shared (Firecracker) host, the measured
efficiency conflates the engine's scaling with the host's willingness to
schedule 8 busy vCPUs — which varies by the hour (round 2 measured 0.829
and 0.267 with IDENTICAL code in different windows).

This script measures the hardware ceiling with Spark removed: K
concurrent *pure-Python* processes each do a fixed amount of work, and we
report per-process slowdown vs solo.  Two workloads:

* ``spin``   — arithmetic loop, no memory traffic (pure ALU ceiling)
* ``churn``  — dict/list build over one small string (the allocation
  pattern of the tokenize+invert inner loop; working set fits in L1/L2,
  so it does NOT exercise shared memory bandwidth)
* ``stream`` — byte-buffer copy over a 256 MiB rotating window (DRAM
  bandwidth ceiling — the resource the Arrow tokenize+invert workers
  actually share: each streams Arrow batches + pandas string blocks far
  larger than cache)

Efficiency(K) = t_solo / t_K per process.  If spin efficiency at K=8 is
~1.0 but a Spark 4x2-JVM run measures 0.2, the host is fine and the
engine is at fault; if spin itself drops to 0.3, no code change can
recover it — the honest report is ceiling-relative.

Usage: python scripts/host_calibration.py [--procs 8] [--reps 3]
Writes HOST_CALIBRATION.json next to the repo's BENCH files.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time, json
mode, scale = sys.argv[1], int(sys.argv[2])

def spin(n):
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc

def stream(n):
    # memory-bandwidth bound: copy slices across a >LLC-sized buffer
    import array
    buf = bytearray(256 * 1024 * 1024)
    mv = memoryview(buf)
    chunk = 8 * 1024 * 1024
    out = 0
    for i in range(n):
        a = (i * chunk) % (len(buf) - chunk)
        b = ((i + 7) * chunk) % (len(buf) - chunk)
        mv[a:a+chunk] = mv[b:b+chunk]
        out += buf[a]
    return out

def churn(n):
    # mimic tokenize+invert: split strings, build per-doc dict of lists
    words = ["tok%d" % (i % 97) for i in range(40)]
    text = " ".join(words)
    out = 0
    for _ in range(n):
        toks = text.split()
        inv = {}
        for pos, t in enumerate(toks):
            ps = inv.get(t)
            if ps is None:
                inv[t] = [pos]
            else:
                ps.append(pos)
        out += len(inv)
    return out

t0 = time.time()
{"spin": spin, "churn": churn, "stream": stream}[mode](scale)
print(json.dumps({"sec": time.time() - t0}))
"""

SCALES = {"spin": 60_000_000, "churn": 300_000, "stream": 400}


def run(mode: str, k: int) -> float:
    """Run k concurrent workers; return the slowest wall time."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, mode, str(SCALES[mode])],
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(k)
    ]
    worst = 0.0
    for p in procs:
        out, _ = p.communicate()
        worst = max(worst, json.loads(out)["sec"])
    return worst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    result: dict = {"procs": args.procs}
    for mode in ("spin", "churn", "stream"):
        solo = min(run(mode, 1) for _ in range(args.reps))
        many = min(run(mode, args.procs) for _ in range(args.reps))
        eff = solo / many
        result[mode] = {
            "solo_sec": round(solo, 2),
            f"x{args.procs}_sec_per_proc": round(many, 2),
            "efficiency": round(eff, 3),
        }
        print(f"{mode}: solo {solo:.2f}s, x{args.procs} {many:.2f}s "
              f"-> efficiency {eff:.3f}", flush=True)
    with open(os.path.join(REPO, "HOST_CALIBRATION.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
