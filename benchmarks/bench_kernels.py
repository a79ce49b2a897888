"""Kernel micro-benchmark: Pallas flash-GAT vs XLA dense at swarm scale.

Usage: python benchmarks/bench_kernels.py [--rows 4096] [--slots 800]

Compares the fused online-softmax Pallas kernel against the materialized XLA
path on the 'seen' relation at scaled swarm sizes (rows = B*A destinations,
slots = padded GT neighborhood size).  Timings are closed with scalar host
fetches (the tunneled chip does not fence on block_until_ready).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat, flash_gat_reference


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096, help="B*A destination rows")
    ap.add_argument("--slots", type=int, default=800, help="padded neighborhood size")
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--feats", type=int, default=64, help="feats per head")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    n, m, h, f = args.rows, args.slots, args.heads, args.feats
    hf = h * f
    # Generate ON DEVICE: pushing GB-scale test tensors through the dev
    # tunnel would dominate the measurement.
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    el = jax.random.normal(ks[0], (n, m, hf), jnp.float32)
    er = jax.random.normal(ks[1], (n, hf), jnp.float32)
    attn = jax.random.normal(ks[2], (h, f), jnp.float32)
    mask = jax.random.uniform(ks[3], (n, m)) > 0.3

    edges = n * m

    # Arrays must be jit ARGUMENTS, not closure captures: captured device
    # arrays are baked into the lowered HLO as constants, and at these sizes
    # (GBs) that ships the whole tensor through the remote compile service.
    ref_fn = jax.jit(lambda a, b, c, d: flash_gat_reference(a, b, c, d, h))
    pal_fn = jax.jit(lambda a, b, c, d: flash_gat(a, b, c, d, h))

    for name, fn in [("xla-dense", ref_fn), ("pallas-flash", pal_fn)]:
        out = fn(el, er, attn, mask)
        checksum = float(jnp.sum(out))  # sync + warmup
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(el, er, attn, mask)
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        per = dt / args.reps
        print(f"{name:14s}: {per * 1e3:8.2f} ms/call  "
              f"{edges / per / 1e9:8.2f} Gedges/s  (checksum {checksum:.1f})")


if __name__ == "__main__":
    main()
