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

    # Float64 NumPy referee: the XLA dense path may run its contractions in
    # bf16 MXU passes, so compare BOTH against high-precision host math.
    el64 = np.asarray(el, np.float64)
    er64 = np.asarray(er, np.float64)
    attn64 = np.asarray(attn, np.float64)
    mask_np = np.asarray(mask)
    f = hf // heads
    e = el64 + er64[:, None, :]
    e = np.where(e >= 0, e, 0.2 * e)
    scores = (e.reshape(n, m, heads, f) * attn64).sum(-1)
    scores = np.where(mask_np[:, :, None], scores, -1e30)
    smax = np.maximum(scores.max(1, keepdims=True), -1e30 / 2)
    smax = np.where(smax <= -1e30 / 2, 0.0, smax)
    p = np.where(mask_np[:, :, None], np.exp(scores - smax), 0.0)
    denom = np.maximum(p.sum(1), 1e-30)
    gold = (np.einsum("nmh,nmhf->nhf", p, el64.reshape(n, m, heads, f))
            / denom[:, :, None]).reshape(n, hf)

    err_pal = np.abs(out_np - gold).max()
    err_ref = np.abs(ref_np - gold).max()
    print(f"max |pallas - fp64| = {err_pal:.2e}; max |xla-dense - fp64| = {err_ref:.2e}")
    assert err_pal < 5e-3, f"pallas error too large: {err_pal}"
    print("PALLAS kernel validated on TPU "
          f"({'more' if err_pal < err_ref else 'less'} accurate than XLA dense)")


if __name__ == "__main__":
    main()
