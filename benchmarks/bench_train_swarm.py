"""Swarm-scale TRAINING A/B: gat_backend dense vs pallas_fused in the real
jitted scan-BPTT update.

The kernel-level swarm A/B (bench_kernels.py) was a bandwidth-bound tie
because both paths read the materialized el [N, M, H*F] from HBM; the
projection-fused kernel (flash_gat_fused + custom VJP) removes that tensor
from both the forward AND the recompute backward.  This script measures the
end-to-end training update where it matters: the MADRQN learner on a
swarm-scale synthetic env_info (many GT slots per agent).

Usage: python benchmarks/bench_train_swarm.py [--gts 400] [--agents 16]
       (single-flight on the chip!)
"""

import argparse
import os.path as osp
import sys
import time
from types import SimpleNamespace as SN

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def run(backend, A, M, K, B, T, n_timed, compute_dtype, device=None):
    import jax
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner

    NF_GT, NF_UBS, N_ACT, HID = 5, 3, 9, 256
    STATE_DIM = A * 2 + M * 4

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(o="gnn", c="tarmac", hidden_size=HID, n_heads=4, n_layers=2,
               batch_size=B, max_seq_len=T, double_q=True, dueling=True,
               replay_size=B * 2, gat_backend=backend,
               compute_dtype=compute_dtype)
    if device:
        cfg["device"] = device
    args = check_args_sanity(SN(**cfg))

    env_info = dict(obs_shape=dict(agent=2, gt=NF_GT - 1, ubs=NF_UBS - 1),
                    state_shape=STATE_DIM, n_actions=N_ACT, n_agents=A,
                    episode_limit=T)
    learner = MultiAgentQLearner(env_info, args, seed=0)

    rng = np.random.default_rng(0)

    def synth_obs():
        return {
            "agent": rng.normal(size=(A, 2)).astype(np.float32),
            "gt": np.concatenate(
                [(rng.random((A, M, 1)) > 0.3).astype(np.float32),
                 rng.normal(size=(A, M, NF_GT - 1)).astype(np.float32)], -1),
            "ubs": np.concatenate(
                [(rng.random((A, K, 1)) > 0.3).astype(np.float32),
                 rng.normal(size=(A, K, NF_UBS - 1)).astype(np.float32)], -1),
            "adj": np.ones((A, A), dtype=bool),
        }

    for _ in range(B):
        for t in range(T):
            learner.cache(
                obs=synth_obs(), h=rng.normal(size=(A, HID)).astype(np.float32),
                state=rng.normal(size=(STATE_DIM,)).astype(np.float32),
                act=rng.integers(N_ACT, size=A),
                rew=rng.normal(size=A).astype(np.float32),
                next_obs=synth_obs(),
                next_h=rng.normal(size=(A, HID)).astype(np.float32),
                next_state=rng.normal(size=(STATE_DIM,)).astype(np.float32),
                done=float(t == T - 1), bad_mask=float(t == T - 1))

    t0 = time.perf_counter()
    m0 = learner.update()
    print(f"[{backend}] compile+first update: {time.perf_counter() - t0:.1f}s "
          f"LossQ={m0['LossQ']:.4f}", flush=True)

    batch = learner._batch_to_device(learner.buffer.sample(learner.batch_size))
    params, targets, opt_state = (learner.params, learner.target_params,
                                  learner.opt_state)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1.0)
    params, targets, opt_state, m = learner._update_jit(
        params, targets, opt_state, batch, key, lr)
    _ = float(m["LossQ"])  # sync

    t0 = time.perf_counter()
    for _ in range(n_timed):
        params, targets, opt_state, m = learner._update_jit(
            params, targets, opt_state, batch, key, lr)
    loss = float(m["LossQ"])
    dt = (time.perf_counter() - t0) / n_timed
    edges = B * (2 * T + 1) * A * (M + K + A)
    print(f"[{backend}] {dt * 1e3:8.1f} ms/update  "
          f"{edges / dt / 1e6:8.1f} M edges/s  LossQ={loss:.4f}", flush=True)
    return dt, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=16)
    ap.add_argument("--gts", type=int, default=400, help="GT slots per agent")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--device", default=None, help="'cpu' for smoke tests")
    ap.add_argument("--backends", nargs="+", default=["dense", "pallas_fused"])
    cli = ap.parse_args()

    from uav_bs_ctrl_tpu.algos.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    results = {}
    for backend in cli.backends:
        results[backend] = run(backend, cli.agents, cli.gts, cli.agents - 1,
                               cli.batch, cli.seq, cli.reps, cli.dtype,
                               device=cli.device)
    if len(results) == 2:
        (b1, (t1, l1)), (b2, (t2, l2)) = results.items()
        print(f"speedup {b1}/{b2}: {t1 / t2:.2f}x  (loss {l1:.4f} vs {l2:.4f})")


if __name__ == "__main__":
    main()
