"""Anatomy of the flagship update: fwd vs bwd time and the HBM roofline.

bench_peak.py showed the update runs at 10.1 TFLOP/s vs a 172 TFLOP/s
big-matmul peak and 60 TFLOP/s at its own dominant matmul shape — so the
binding resource is NOT MXU issue rate.  This probe splits the update into
parts and measures the chip's HBM stream bandwidth to locate the bound:

1. hbm_bw_gbps: elementwise triad over a 256 MB array (read+read+write).
2. fwd_ms: the jitted LOSS only (both scans, no grad) at the bench config.
3. grad_ms: jitted value_and_grad (the bench's timed quantity minus
   optimizer/Polyak, which 4. measures).
4. update_ms: the full update (grad + clip + AdamW + Polyak) — bench parity.

Timing closed with scalar host fetches (tunneled-chip fencing rule).

Usage: python benchmarks/bench_scan_anatomy.py [B]   (default 256)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, fence, n=10):
    fence(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # An explicit CLI argument always wins; a pre-set BENCH_B env var only
    # applies when no argument is given (ADVICE r4).
    if len(sys.argv) > 1:
        os.environ["BENCH_B"] = sys.argv[1]
    else:
        os.environ.setdefault("BENCH_B", "256")
    import jax
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.algos.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import bench

    res = {"B": bench.B}

    # 1. HBM triad bandwidth.
    n = 64 * 1024 * 1024  # 256 MB f32
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def triad(a, b):
        return a + 2.5 * b

    out = triad(a, b)
    _ = float(out[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = triad(out, b)
    _ = float(out[0])
    dt = (time.perf_counter() - t0) / 10
    res["hbm_bw_gbps"] = round(3 * 4 * n / dt / 1e9, 1)

    # 2-4. The flagship update, decomposed.  Reuse bench's learner setup.
    import numpy as np
    from types import SimpleNamespace as SN
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(bench.TRAIN_KW)
    args = check_args_sanity(SN(**cfg))
    env_info = dict(obs_shape=dict(agent=2, gt=bench.NF_GT - 1,
                                   ubs=bench.NF_UBS - 1),
                    state_shape=bench.STATE_DIM, n_actions=bench.N_ACT,
                    n_agents=bench.A, episode_limit=bench.T)
    learner = MultiAgentQLearner(env_info, args, seed=0)
    rng = np.random.default_rng(0)
    for _ in range(bench.B):
        for t in range(bench.T):
            learner.cache(
                obs=bench.synth_obs(rng, ()),
                h=rng.normal(size=(bench.A, bench.HID)).astype(np.float32),
                state=rng.normal(size=(bench.STATE_DIM,)).astype(np.float32),
                act=rng.integers(bench.N_ACT, size=bench.A),
                rew=rng.normal(size=bench.A).astype(np.float32),
                next_obs=bench.synth_obs(rng, ()),
                next_h=rng.normal(size=(bench.A, bench.HID)).astype(np.float32),
                next_state=rng.normal(size=(bench.STATE_DIM,)).astype(np.float32),
                done=float(t == bench.T - 1), bad_mask=float(t == bench.T - 1))
    batch = learner._batch_to_device(
        learner.buffer.sample(bench.B, rng=np.random.default_rng(1)))
    key = jax.random.PRNGKey(0)

    params = jax.tree_util.tree_map(jnp.asarray, learner.params)
    targets = jax.tree_util.tree_map(jnp.asarray, learner.target_params)

    loss_fn = jax.jit(lambda p: learner._loss_fn(p, targets, batch, key)[0])
    res["fwd_ms"] = round(timeit(lambda: loss_fn(params), lambda x: float(x)), 1)

    grad_fn = jax.jit(lambda p: jax.value_and_grad(
        lambda q: learner._loss_fn(q, targets, batch, key)[0])(p))
    res["grad_ms"] = round(timeit(
        lambda: grad_fn(params), lambda x: float(x[0])), 1)

    upd = jax.jit(learner._update_fn)
    res["update_ms"] = round(timeit(
        lambda: upd(params, targets, learner.opt_state, batch, key,
                    jnp.float32(1.0)),
        lambda x: float(x[3]["LossQ"])), 1)

    res["bwd_only_ms"] = round(res["grad_ms"] - res["fwd_ms"], 1)
    res["opt_polyak_ms"] = round(res["update_ms"] - res["grad_ms"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
