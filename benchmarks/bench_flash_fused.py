"""Hardware A/B: fused-projection flash GAT vs unfused pallas vs XLA dense.

The swarm-scale A/B in RESULTS.md showed pallas == dense (both HBM-bound on
reading the materialized el [N, M, H*F]).  flash_gat_fused removes that
traffic entirely by projecting raw d_src-wide source features on-chip, so the
expected win is ~(H*F/d_src)x less read bandwidth on the edge axis.

Usage: python benchmarks/bench_flash_fused.py   (single-flight on the chip!)
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat, flash_gat_fused,
                                                flash_gat_fused_reference)


def timed(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))              # tunnel-safe fence (see CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    # Swarm scale matching the RESULTS.md A/B: 4096 destinations x 800 slots.
    n, m, d, heads, f = 4096, 800, 8, 4, 64
    hf = heads * f
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (n, m, d), jnp.float32)
    w = jax.random.normal(ks[1], (d, hf), jnp.float32) / np.sqrt(d)
    b = jax.random.normal(ks[2], (hf,), jnp.float32)
    er = jax.random.normal(ks[3], (n, hf), jnp.float32)
    attn = jax.random.normal(ks[4], (heads, f), jnp.float32)
    mask = jax.random.uniform(ks[0], (n, m)) > 0.3

    edges = n * m

    dense = jax.jit(lambda *a: flash_gat_fused_reference(*a, n_heads=heads))
    t_dense, s_dense = timed(dense, x, w, b, er, attn, mask)
    print(f"dense      : {t_dense * 1e3:8.2f} ms  {edges / t_dense / 1e6:8.1f} M edges/s  sum={s_dense:.3f}", flush=True)

    el = jnp.asarray(x @ w + b)
    unfused = jax.jit(lambda el_, er_, a_, m_: flash_gat(el_, er_, a_, m_, heads))
    t_unf, s_unf = timed(unfused, el, er, attn, mask)
    print(f"pallas     : {t_unf * 1e3:8.2f} ms  {edges / t_unf / 1e6:8.1f} M edges/s  sum={s_unf:.3f}  (el pre-materialized)", flush=True)

    fused = jax.jit(lambda *a: flash_gat_fused(*a, n_heads=heads))
    t_fus, s_fus = timed(fused, x, w, b, er, attn, mask)
    print(f"pallas+fuse: {t_fus * 1e3:8.2f} ms  {edges / t_fus / 1e6:8.1f} M edges/s  sum={s_fus:.3f}", flush=True)

    np.testing.assert_allclose(s_fus, s_dense, rtol=1e-3)
    print(f"speedup vs dense: {t_dense / t_fus:.2f}x, vs unfused pallas: {t_unf / t_fus:.2f}x")

    # MXU-contraction variant (block-diag score matmul + single-batch
    # aggregation dot_general) across tile sizes: the VPU multiply+reduce
    # path above was the bound after the projection fusion (RESULTS.md).
    best = (t_fus, "pallas+fuse tile_n=8")
    for mxu in (False, True):
        for tile_n in (8, 16, 32):
            if not mxu and tile_n == 8:
                continue  # already measured above
            try:
                k = jax.jit(lambda *a, tn=tile_n, mx=mxu: flash_gat_fused(
                    *a, n_heads=heads, tile_n=tn, mxu=mx))
                t, s = timed(k, x, w, b, er, attn, mask)
            except Exception as exc:  # Mosaic lowering rejection
                print(f"mxu={int(mxu)} tile_n={tile_n:3d}: FAILED "
                      f"({type(exc).__name__}: {str(exc)[:120]})", flush=True)
                continue
            ok = "OK " if abs(s - s_dense) / abs(s_dense) < 1e-3 else "BAD"
            print(f"mxu={int(mxu)} tile_n={tile_n:3d}: {t * 1e3:8.2f} ms  "
                  f"{edges / t / 1e6:8.1f} M edges/s  sum={s:.3f} {ok}",
                  flush=True)
            if ok == "OK " and t < best[0]:
                best = (t, f"mxu={int(mxu)} tile_n={tile_n}")
    print(f"best: {best[1]} at {best[0] * 1e3:.2f} ms "
          f"({t_dense / best[0]:.2f}x vs dense)")


if __name__ == "__main__":
    main()
