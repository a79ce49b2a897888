"""Hardware A/B: XLA recurrent step vs the fused Pallas step megakernel.

The round-3 roofline pinned the flagship update at a ~0.85 ms/scan-step
latency floor (hoist/unroll/merge all refuted); the remaining lever is
collapsing the per-step kernel chain into one Pallas call forward + one
backward (ops/step_kernels.py, step_backend='pallas').  This A/B runs the
REAL bench update (bench.bench_tpu) across step backends and BPTT schedules
and prints one JSON line per cell, including the first-update loss so
numerical agreement across backends is visible in the artifact (the VJP-level
exactness lives in tests/test_step_kernel.py).

Usage: python benchmarks/bench_step_ab.py [B ...]   (default 256)
Run on a QUIET chip (single-flight).
"""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(b, step, bptt, dtype="bfloat16", n_timed=20):
    import gc
    gc.collect()
    os.environ["BENCH_B"] = str(b)
    os.environ["BENCH_STEP"] = step
    os.environ["BENCH_BPTT"] = bptt
    os.environ["BENCH_DTYPE"] = dtype
    import bench
    importlib.reload(bench)
    edges_per_s = bench.bench_tpu(n_timed=n_timed)
    return dict(B=b, step=step, bptt=bptt, dtype=dtype,
                edges_per_s=round(edges_per_s),
                ms_per_update=round(bench.EDGES_PER_UPDATE / edges_per_s * 1e3, 2),
                first_loss=round(getattr(bench, "LAST_FIRST_LOSS", float("nan")), 4))


def main():
    ladder = [int(a) for a in sys.argv[1:]] or [256]
    for b in ladder:
        # bf16 throughput cells + an f32 pair for exact loss parity (the
        # kernel accumulates f32, so under bf16 its loss legitimately differs
        # from the bf16 XLA step in the 3rd decimal — the f32 pair matches to
        # 4 decimals, CPU-verified; confirm on chip).
        for step, bptt, dtype, nt in (
                ("xla", "per_step", "bfloat16", 20),
                ("pallas", "per_step", "bfloat16", 20),
                ("pallas", "hoisted", "bfloat16", 20),
                ("xla", "per_step", "float32", 10),
                ("pallas", "per_step", "float32", 10)):
            try:
                print(json.dumps(run(b, step, bptt, dtype, nt)), flush=True)
            except Exception as e:
                print(f"B={b} {step}/{bptt}/{dtype} failed: {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
