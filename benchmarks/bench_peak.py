"""Chip peak probe: measured matmul throughput ceilings for the roofline.

The round-4 step-megakernel A/B (bench_step_ab.py) landed within noise of
the XLA step (79.3M vs 78.5M edges/s), and the batch sweep shows update time
scaling ~7.1x for 8x batch — i.e. at B=256 the flagship update is COMPUTE-
throughput-bound on this chip, not scan-latency-bound (revising the round-3
reading).  This probe measures what the chip can actually do:

1. big-matmul peak: [4096 x 4096] @ [4096 x 4096] bf16 chain — the MXU
   ceiling for ideally-shaped work;
2. GRU-shaped chain: [2048, 576] @ [576, 768] bf16 — the flagship update's
   dominant per-step contraction at its REAL shape;
3. the same at f32 for the dtype ratio.

utilization(flagship) = (update FLOPs / update time) / big-matmul peak.

Timing is closed with a scalar host fetch (block_until_ready does not
reliably fence over the tunneled chip).

Usage: python benchmarks/bench_peak.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def chain_matmul_tflops(m, k, n, dtype, n_chain=64, n_timed=5):
    import jax
    import jax.numpy as jnp

    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    c = jnp.ones((n, k), dtype)

    @jax.jit
    def chain(a):
        # Alternate shapes so the chain stays sequential (no CSE) and ends
        # back at [m, k]; every link is 2*m*k*n FLOPs.
        for _ in range(n_chain // 2):
            x = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
            a = jax.lax.dot_general(x, c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
        return a

    out = chain(a)
    _ = float(out[0, 0])  # compile + fence
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = chain(out)
    _ = float(out[0, 0])
    dt = (time.perf_counter() - t0) / n_timed
    flops = 2.0 * m * k * n * n_chain
    return flops / dt / 1e12


def main():
    from uav_bs_ctrl_tpu.algos.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    res = {}
    res["peak_bf16_4096"] = round(chain_matmul_tflops(
        4096, 4096, 4096, "bfloat16"), 2)
    res["peak_f32_4096"] = round(chain_matmul_tflops(
        4096, 4096, 4096, "float32"), 2)
    res["gru_shape_bf16"] = round(chain_matmul_tflops(
        2048, 576, 768, "bfloat16", n_chain=256, n_timed=5), 2)
    # Flagship-update utilization: FLOPs from the analytical count
    # (fwd ~1.4 MFLOP/row x 2048 rows x 201 steps, bwd ~2x fwd).  Update
    # times come from the CLI/env (measured by bench.py on the same chip) so
    # a perf change can't silently report stale utilization (ADVICE r4):
    #   python bench_peak.py [update_ms ...]   or   BENCH_UPDATE_MS=171.26
    import os
    import sys
    upd_flops = 1.4e6 * 2048 * 201 * 3
    times = [float(a) for a in sys.argv[1:]]
    if not times and os.environ.get("BENCH_UPDATE_MS"):
        times = [float(x) for x in os.environ["BENCH_UPDATE_MS"].split(",")]
    res["update_ms_source"] = ("cli/env" if times
                               else "r4 default (bench.py 2026-08-21)")
    for idx, ms in enumerate(times or [171.26]):
        res[f"util_vs_peak_update{idx}_{ms}ms"] = round(
            (upd_flops / (ms / 1e3) / 1e12) / res["peak_bf16_4096"], 3)
        res[f"update_tflops_{idx}"] = round(upd_flops / (ms / 1e3) / 1e12, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
