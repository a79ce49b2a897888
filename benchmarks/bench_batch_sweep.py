"""Batch-growth sweep of the flagship training update (roofline lever).

The flagship update at the reference batch (B=32) is LATENCY-bound: 101
sequential scan steps of small ops leave the MXU/HBM <2% utilized
(benchmarks/RESULTS.md).  Throughput therefore scales with batch until the
per-step work saturates the chip.  This sweep runs ``bench.bench_tpu`` at a
ladder of batch sizes on the real chip and reports ms/update and edges/s for
each; the winner becomes ``bench.py``'s default B (and, having compiled here,
its executable lands in the persistent cache so the driver's bench run pays
no compile).

Run on a QUIET chip (single-flight; see logs/queue_r3.jobs).
Usage: python benchmarks/bench_batch_sweep.py [B ...]
"""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_at(b, n_timed=20):
    import gc
    gc.collect()  # drop the previous ladder rung's device buffers
    os.environ["BENCH_B"] = str(b)
    import bench
    importlib.reload(bench)
    edges_per_s = bench.bench_tpu(n_timed=n_timed)
    return dict(B=b, edges_per_s=round(edges_per_s),
                ms_per_update=round(bench.EDGES_PER_UPDATE / edges_per_s * 1e3, 2))


def main():
    ladder = [int(a) for a in sys.argv[1:]] or [32, 64, 128, 256]
    results = []
    for b in ladder:
        try:
            r = run_at(b)
        except Exception as e:  # OOM at large B ends the ladder, keep results
            print(f"B={b} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            break
        print(json.dumps(r), flush=True)
        results.append(r)
    if results:
        best = max(results, key=lambda r: r["edges_per_s"])
        print(json.dumps(dict(best=best)), flush=True)


if __name__ == "__main__":
    main()
