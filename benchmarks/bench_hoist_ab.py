"""Hardware A/B: per-step vs hoisted-encoder BPTT schedule (bench.bench_tpu).

'hoisted' (algos/core.py) moves the h-independent GATv2 observation encoding
out of the sequential scan into one batched contraction over all T+1
timesteps — on the MXU this should amortize the latency-bound scan; on
cache-based hosts the per-step path's smaller working set wins (measured
~1.5x faster on this box's CPU).  Identical math (tests/test_learner.py).

Usage: python benchmarks/bench_hoist_ab.py [B ...]   (default 32 256)
Run on a QUIET chip (single-flight).
"""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(b, schedule, n_timed=20):
    import gc
    gc.collect()
    os.environ["BENCH_B"] = str(b)
    os.environ["BENCH_BPTT"] = schedule
    import bench
    importlib.reload(bench)
    edges_per_s = bench.bench_tpu(n_timed=n_timed)
    return dict(B=b, bptt=schedule, edges_per_s=round(edges_per_s),
                ms_per_update=round(bench.EDGES_PER_UPDATE / edges_per_s * 1e3, 2))


def main():
    ladder = [int(a) for a in sys.argv[1:]] or [32, 256]
    for b in ladder:
        for schedule in ("per_step", "hoisted"):
            try:
                print(json.dumps(run(b, schedule)), flush=True)
            except Exception as e:
                print(f"B={b} {schedule} failed: {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
