"""Hardware A/B: lax.scan unroll factor for the BPTT unrolls.

The flagship update is latency-bound on per-step launch/fusion boundaries
(the hoisted-encoder A/B showed batching the GAT out of the scan does NOT
help — the scan itself is the bound).  Unrolling lets XLA fuse and pipeline
small ops across timesteps.  Identical math (unroll is a scheduling knob).

Usage: python benchmarks/bench_unroll_ab.py [unroll ...] (default 1 4 8)
Env: BENCH_B picks the batch (default 32).  Run on a QUIET chip.
"""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(unroll, n_timed=20):
    import gc
    gc.collect()
    os.environ["BENCH_UNROLL"] = str(unroll)
    import bench
    importlib.reload(bench)
    edges_per_s = bench.bench_tpu(n_timed=n_timed)
    return dict(B=bench.B, unroll=unroll, edges_per_s=round(edges_per_s),
                ms_per_update=round(bench.EDGES_PER_UPDATE / edges_per_s * 1e3, 2))


def main():
    ladder = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    for unroll in ladder:
        try:
            print(json.dumps(run(unroll)), flush=True)
        except Exception as e:
            print(f"unroll={unroll} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
