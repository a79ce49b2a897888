"""Hardware A/B: dense-masked vs padded-CSR (segment) vs Pallas flash GATv2.

VERDICT r4 item 9: ``ops/segment.py`` is a tested sparse-kernel library that
no training path selects.  This benchmark settles its fate with numbers: the
same masked GATv2 attention+aggregation (train step: forward + backward via
``jax.grad``) through three implementations, at the flagship slot shape
(N=2048, M=50) and a swarm shape (N=4096, M=800, 30% valid).

The segment path runs the slot layout as a padded edge list (each slot is an
edge; dst = row, edge features = slot features) — ``segment_softmax`` +
``spmm_attention`` do the per-destination normalization/aggregation.  On TPU
with STATIC shapes the edge list cannot be compacted (that would be a dynamic
shape), so the sparse path processes the same padded edge count as the dense
path but through gather/scatter instead of batched matmuls — the hypothesis
to test is whether segment ops ever beat the MXU-friendly layouts.

Usage: python benchmarks/bench_segment_ab.py   (on the TPU; prints JSON)
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_inputs(rng, n, m, d, heads, f, valid_frac):
    hf = heads * f
    x = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, hf)).astype(np.float32) / np.sqrt(d))
    b = jnp.asarray(rng.normal(size=(hf,)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, m)) < valid_frac)
    mask = mask.at[:, 0].set(True)
    cot = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    return x, w, b, er, attn, mask, cot


def dense_fn(x, w, b, er, attn, mask, heads, f):
    from uav_bs_ctrl_tpu.ops.masked import masked_softmax
    el = x @ w + b
    el_h = el.reshape(el.shape[:-1] + (heads, f))
    er_h = er[:, None].reshape(er.shape[0], 1, heads, f)
    e = jax.nn.leaky_relu(el_h + er_h, 0.2)
    scores = jnp.sum(e * attn, axis=-1)                       # [N, M, H]
    alpha = masked_softmax(scores, mask[..., None], axis=-2)
    ft = jnp.sum(alpha[..., None] * el_h, axis=-3)
    return ft.reshape(ft.shape[0], heads * f)


def segment_fn(x, w, b, er, attn, mask, heads, f):
    from uav_bs_ctrl_tpu.ops import segment
    n, m, d = x.shape
    hf = heads * f
    el = (x @ w + b).reshape(n * m, heads, f)                 # edge features
    dst = jnp.repeat(jnp.arange(n), m)                        # [E]
    edge_mask = mask.reshape(n * m)
    e = jax.nn.leaky_relu(el + er.reshape(n, heads, f)[dst], 0.2)
    scores = jnp.sum(e * attn, axis=-1)                       # [E, H]
    alpha = segment.segment_softmax(scores, dst, edge_mask, n)
    out = segment.segment_sum(alpha[..., None] * el, dst, edge_mask, n)
    return out.reshape(n, hf)


def pallas_fn(x, w, b, er, attn, mask, heads, f):
    from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat_fused_train
    # tile_n=16: this A/B runs f32 (the layouts under comparison are the
    # variable, not the dtype); the 32-row MXU tile only fits VMEM in bf16.
    return flash_gat_fused_train(x, w, b, er, attn,
                                 mask.astype(x.dtype), heads, 0.2,
                                 16, 128, None, True, False)


def bench_one(name, fn, inputs, heads, f, n_timed=30):
    x, w, b, er, attn, mask, cot = inputs

    def loss(w_, b_, er_, attn_):
        return jnp.sum(fn(x, w_, b_, er_, attn_, mask, heads, f) * cot)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    g = step(w, b, er, attn)
    _ = float(g[0][0, 0])  # compile + sync (tunnel-safe scalar fetch)
    t0 = time.perf_counter()
    for _ in range(n_timed):
        g = step(w, b, er, attn)
    _ = float(g[0][0, 0])
    ms = (time.perf_counter() - t0) / n_timed * 1e3
    log(f"{name}: {ms:.2f} ms/grad-step")
    return round(ms, 3), g


def main():
    from uav_bs_ctrl_tpu.algos.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    res = {"backend": jax.default_backend()}
    for label, (n, m, d, valid) in {
        "flagship_n2048_m50": (2048, 50, 4, 0.7),
        "swarm_n4096_m800": (4096, 800, 8, 0.3),
    }.items():
        heads, f = 4, 64
        rng = np.random.default_rng(0)
        inputs = make_inputs(rng, n, m, d, heads, f, valid)
        row = {}
        grads = {}
        for name, fn in (("dense", dense_fn), ("segment", segment_fn),
                         ("pallas_mxu", pallas_fn)):
            try:
                row[name + "_ms"], grads[name] = bench_one(
                    f"{label}/{name}", fn, inputs, heads, f)
            except Exception as e:  # e.g. HBM OOM: that IS the result
                msg = str(e)
                oom = "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg
                row[name + "_ms"] = "OOM" if oom else "ERROR"
                log(f"{label}/{name}: {'OOM' if oom else msg.splitlines()[0]}")
        # Cross-backend gradient agreement (same math, three layouts).
        for name in ("segment", "pallas_mxu"):
            if name not in grads or "dense" not in grads:
                continue
            err = max(float(jnp.max(jnp.abs(a - b)))
                      for a, b in zip(grads["dense"], grads[name]))
            row[name + "_grad_maxerr"] = round(err, 6)
        res[label] = row
    print(json.dumps(res))


if __name__ == "__main__":
    main()
