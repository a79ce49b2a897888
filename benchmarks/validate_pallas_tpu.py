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


def validate_fused_train():
    """Compile+run flash_gat_fused_train fwd AND custom-VJP bwd on the TPU at
    the FLAGSHIP slot counts (r5 slot-sized tiles: M=50 -> one 56/64-row
    tile, K=7 -> 8/16) in f32 and bf16, vs an fp64 NumPy gold referee.

    The referee is HOST fp64 math (like main()), not the XLA dense twin: on
    TPU the dense twin's own f32 matmuls run as bf16 MXU passes under
    --xla_allow_excess_precision, and the er-cotangent's small magnitude
    (|der|max ~ 21 vs |dw|max ~ 16k at this shape) turns that absolute noise
    into a bogus 0.39 max-rel "error" that is entirely the referee's
    (measured round 5; the Pallas kernel lands at 1e-6 of fp64 in f32).
    """
    from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat_fused_train
    for m, dtype, tol in ((50, jnp.float32, 1e-4), (7, jnp.float32, 1e-4),
                          (50, jnp.bfloat16, 6e-2), (7, jnp.bfloat16, 6e-2)):
        n, d, heads, f = 2048, 4, 4, 64
        hf = heads * f
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        x = jax.random.normal(ks[0], (n, m, d), dtype)
        w = (jax.random.normal(ks[1], (d, hf), dtype) / np.sqrt(d)).astype(dtype)
        b = jax.random.normal(ks[2], (hf,), dtype)
        er = jax.random.normal(ks[3], (n, hf), dtype)
        attn = jax.random.normal(ks[4], (heads, f), dtype)
        mask_b = jax.random.uniform(ks[5], (n, m)) > 0.3
        mask_f = mask_b.astype(dtype)

        def loss_pallas(w_, b_, er_, attn_):
            o = flash_gat_fused_train(x, w_, b_, er_, attn_, mask_f, heads,
                                      0.2, 32, 128, None, True, False)
            return jnp.sum(o.astype(jnp.float32))

        t0 = time.perf_counter()
        vp, gp_ = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3))(
            w, b, er, attn)

        # fp64 gold (the dtype-rounded inputs are the ground truth the kernel
        # sees; bf16 rounding error of the INPUTS is therefore excluded, the
        # kernel's own arithmetic is not).
        X = np.asarray(x, np.float64); W = np.asarray(w, np.float64)
        B = np.asarray(b, np.float64); ER = np.asarray(er, np.float64)
        A = np.asarray(attn, np.float64); MK = np.asarray(mask_b)
        el = X @ W + B
        z = el + ER[:, None, :]
        lz = np.where(z >= 0, z, 0.2 * z)
        scores = (lz.reshape(n, m, heads, f) * A).sum(-1)
        scores = np.where(MK[:, :, None], scores, -1e30)
        smax = scores.max(1, keepdims=True)
        smax = np.where(smax <= -1e30 / 2, 0.0, smax)
        p = np.where(MK[:, :, None], np.exp(scores - smax), 0.0)
        alpha = p / np.maximum(p.sum(1, keepdims=True), 1e-30)
        el4 = el.reshape(n, m, heads, f)
        out = np.einsum("nmh,nmhf->nhf", alpha, el4)
        vg = out.sum()
        g = np.ones((n, heads, f))
        d_alpha = np.einsum("nhf,nmhf->nmh", g, el4)
        dvec = np.einsum("nhf,nhf->nh", g, out)
        d_s = alpha * (d_alpha - dvec[:, None, :])
        dleaky = np.where(z >= 0, 1.0, 0.2).reshape(n, m, heads, f)
        d_z = d_s[..., None] * A[None, None] * dleaky
        d_el = ((alpha[..., None] * g[:, None]) + d_z).reshape(n, m, hf)
        gold = (np.einsum("nmd,nmq->dq", X, d_el),          # dw
                d_el.sum((0, 1)),                           # db
                d_z.sum(1).reshape(n, hf),                  # der
                np.einsum("nmh,nmhf->hf", d_s,
                          lz.reshape(n, m, heads, f)))      # dattn

        rel_v = abs(float(vp) - vg) / max(abs(vg), 1e-6)
        max_rel_g = 0.0
        for a_, b_ in zip(gp_, gold):
            a_ = np.asarray(a_, np.float64)
            scale = np.abs(b_).max() + 1e-6
            max_rel_g = max(max_rel_g, float(np.abs(a_ - b_).max() / scale))
        print(f"fused_train m={m} {np.dtype(dtype).name}: loss rel {rel_v:.2e}, "
              f"grad max-rel vs fp64 {max_rel_g:.2e} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        assert rel_v < tol and max_rel_g < tol, (m, dtype, rel_v, max_rel_g)
    print("FUSED-TRAIN kernel (slot-sized tiles, no-dx bwd) validated on TPU")


if __name__ == "__main__":
    main()
    validate_fused_train()
