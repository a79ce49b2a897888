"""One-shot validation: compile + run flash_gat on the real TPU and compare
against the XLA dense path (correctness gate for the compiled kernel; the CI
suite runs it in interpret mode on CPU).

Usage: python benchmarks/validate_pallas_tpu.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat, flash_gat_reference


def main():
    n, m, heads, f = 128, 256, 4, 64
    hf = heads * f
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    el = jax.random.normal(ks[0], (n, m, hf), jnp.float32)
    er = jax.random.normal(ks[1], (n, hf), jnp.float32)
    attn = jax.random.normal(ks[2], (heads, f), jnp.float32)
    mask = jax.random.uniform(ks[3], (n, m)) > 0.3

    t0 = time.perf_counter()
    ref = flash_gat_reference(el, er, attn, mask, heads)
    ref_np = np.asarray(ref)
    print(f"dense ok in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = flash_gat(el, er, attn, mask, heads)
    out_np = np.asarray(out)
    print(f"pallas ok in {time.perf_counter() - t0:.1f}s", flush=True)

    np.testing.assert_allclose(out_np, ref_np, atol=3e-4, rtol=2e-4)
    print("PALLAS == DENSE on TPU: OK")


if __name__ == "__main__":
    main()
