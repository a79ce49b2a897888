"""Isolate the sequential scan's cost from the encoder's (round-4 epilogue).

In the hoisted+pallas schedule the update is: batched encoder over all T+1
timesteps (MXU-friendly) + a scan whose body is ONE fused step kernel + the
backward of both.  The full update times at ~188 ms; this probe measures the
pieces in isolation on the real chip:

1. scan_fwd_ms: lax.scan of ONLY the fused step kernel over 101 steps on a
   precomputed x-sequence (no grad) — the irreducible sequential forward.
2. scan_grad_ms: value_and_grad of (1) — sequential fwd+bwd.
3. enc_fwd_ms / enc_grad_ms: the batched GraphObservationEncoder over
   [T+1, B, ...] alone (pallas_fused_mxu backend), fwd and fwd+bwd.

If scan_grad + enc_grad ≈ the full update's 171-188 ms, the decomposition
localizes the next lever; if scan_fwd alone is large, the per-step floor
lives in the scan machinery / kernel dispatch itself.

Usage: python benchmarks/bench_step_scan_isolation.py   (REAL chip, quiet)
"""

import json
import os
import sys
import time
from types import SimpleNamespace as SN

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

A, M, K = 8, 50, 7
NF_GT, NF_UBS = 5, 3
HID, HEADS, MSG, KEYSZ = 256, 4, 64, 16
N_ACT = 9
B = int(os.environ.get("BENCH_B", 256))
T = 50


def timeit(fn, fence, n=10):
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    return round((time.perf_counter() - t0) / n * 1e3, 1)


def main():
    import jax
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.algos.common import (check_args_sanity,
                                              enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    from uav_bs_ctrl_tpu.models.agents import GnnAgent

    args = check_args_sanity(SN(
        hidden_size=HID, n_layers=2, n_heads=HEADS, msg_size=MSG,
        key_size=KEYSZ, n_rounds=1, dueling=True, c="tarmac", o="gnn",
        gat_backend="pallas_fused_mxu", step_backend="pallas",
        compute_dtype="bfloat16", device="tpu"))
    obs_shape = dict(agent=2, gt=NF_GT - 1, ubs=NF_UBS - 1)
    agent = GnnAgent(obs_shape, N_ACT, args)
    params = agent.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)

    rng = np.random.default_rng(0)
    steps = 2 * T + 1  # policy (T+1) + target (T) sequential steps, one scan
    x_seq = jnp.asarray(rng.normal(size=(steps, B, A, HID)),
                        jnp.bfloat16)
    adj = jnp.ones((steps, B, A, A), bool)
    h0 = jnp.zeros((B, A, HID), jnp.bfloat16)

    def scan_only(params, x_seq):
        def step(h, inp):
            q, h = agent.step(params, inp["x"], inp["adj"], h, None)
            return h, jnp.sum(q.astype(jnp.float32))
        h, qs = jax.lax.scan(step, h0, {"x": x_seq, "adj": adj})
        return jnp.sum(qs)

    res = {"B": B, "steps": steps}
    f = jax.jit(scan_only)
    res["scan_fwd_ms"] = timeit(lambda: f(params, x_seq), lambda x: float(x))
    g = jax.jit(jax.value_and_grad(scan_only))
    res["scan_grad_ms"] = timeit(lambda: g(params, x_seq),
                                 lambda x: float(x[0]))

    obs = {
        "agent": jnp.asarray(rng.normal(size=(steps, B, A, 2)), jnp.bfloat16),
        "gt": jnp.asarray(np.concatenate(
            [(rng.random((steps, B, A, M, 1)) > 0.3).astype(np.float32),
             rng.normal(size=(steps, B, A, M, NF_GT - 1)).astype(np.float32)],
            -1), jnp.bfloat16),
        "ubs": jnp.asarray(np.concatenate(
            [(rng.random((steps, B, A, K, 1)) > 0.3).astype(np.float32),
             rng.normal(size=(steps, B, A, K, NF_UBS - 1)).astype(np.float32)],
            -1), jnp.bfloat16),
    }

    def enc_only(params, obs):
        return jnp.sum(agent.encode(params, obs).astype(jnp.float32))

    fe = jax.jit(enc_only)
    res["enc_fwd_ms"] = timeit(lambda: fe(params, obs), lambda x: float(x))
    ge = jax.jit(jax.value_and_grad(enc_only))
    res["enc_grad_ms"] = timeit(lambda: ge(params, obs), lambda x: float(x[0]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
