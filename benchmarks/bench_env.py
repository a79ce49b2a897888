"""Env throughput benchmark: on-device vectorized rollouts vs host-driven loop.

Usage: python benchmarks/bench_env.py [--map 4ubs] [--worlds 128 512]

Measures env steps/s for:
- the on-device path (``algos.collect.collect_chunk``: vmapped jittable env +
  policy scan, one device program per chunk), and
- the classic host-driven loop (NumPy env + per-step jitted act) for context.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from types import SimpleNamespace as SN

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect
from uav_bs_ctrl_tpu.envs import jax_env
from uav_bs_ctrl_tpu.models.agents import GnnAgent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="4ubs")
    ap.add_argument("--worlds", type=int, nargs="+", default=[128, 512])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()

    params = jax_env.make_params(args.map)
    T = params.episode_limit
    margs = SN(hidden_size=args.hidden, n_layers=2, n_heads=4, msg_size=64,
               key_size=16, n_rounds=1, dueling=True, c="tarmac", o="gnn")
    nf_gt = 4  # feature dims excl. flag (fair_service adds one)
    agent = GnnAgent(dict(agent=2, gt=nf_gt, ubs=2), params.n_actions, margs)
    p = {"net": agent.init(jax.random.PRNGKey(0))}

    def apply_fn(pp, obs, h, k):
        return agent.apply(pp["net"], obs, h, k)

    pool = collect.make_layout_pool(args.map, 64, seed=0)
    for B in args.worlds:
        states = collect.reset_worlds(params, pool, jax.random.PRNGKey(1), B)
        h0 = jnp.zeros((B, params.n_ubs, args.hidden))
        chunk, sf, _ = collect.collect_chunk(params, apply_fn, p, states, h0, T,
                                             jax.random.PRNGKey(2), jnp.float32(0.5))
        _ = float(sf.ep_ret.sum())  # compile + sync
        t0 = time.perf_counter()
        for r in range(args.reps):
            chunk, sf, _ = collect.collect_chunk(params, apply_fn, p, states, h0, T,
                                                 jax.random.PRNGKey(3 + r),
                                                 jnp.float32(0.5))
        _ = float(sf.ep_ret.sum())
        dt = time.perf_counter() - t0
        steps = B * T * args.reps
        print(f"on-device B={B:5d}: {steps / dt:12,.0f} env steps/s "
              f"({dt / args.reps * 1e3:.1f} ms/chunk, policy included)")


if __name__ == "__main__":
    main()
