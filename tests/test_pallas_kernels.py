"""Golden tests for the Pallas flash-GAT kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat, flash_gat_reference


@pytest.mark.parametrize("n,m,heads,f,tile_m", [
    (16, 128, 4, 64, 128),     # exact tile fit
    (10, 200, 4, 64, 128),     # padding in both N and M
    (8, 256, 2, 128, 128),     # multiple M tiles (online softmax across blocks)
    (4, 50, 4, 32, 32),
])
def test_flash_gat_matches_reference(n, m, heads, f, tile_m):
    rng = np.random.default_rng(0)
    hf = heads * f
    el = jnp.asarray(rng.normal(size=(n, m, hf)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, m)) > 0.4)
    mask = mask.at[1].set(False)  # an all-masked destination -> exact zeros

    ref = flash_gat_reference(el, er, attn, mask, heads)
    out = flash_gat(el, er, attn, mask, heads, tile_n=8, tile_m=tile_m,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_flash_gat_online_softmax_stability():
    """Large score magnitudes across different M blocks must not overflow."""
    rng = np.random.default_rng(1)
    n, m, heads, f = 8, 256, 2, 64
    hf = heads * f
    el = jnp.asarray((50 * rng.normal(size=(n, m, hf))).astype(np.float32))
    er = jnp.asarray((50 * rng.normal(size=(n, hf))).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask = jnp.ones((n, m), dtype=bool)

    ref = flash_gat_reference(el, er, attn, mask, heads)
    out = flash_gat(el, er, attn, mask, heads, tile_n=8, tile_m=128, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize("n,m,d,heads,f,tile_m", [
    (16, 128, 8, 4, 64, 128),    # exact tile fit
    (10, 200, 5, 4, 64, 128),    # padding in N and M, odd feature width
    (8, 256, 6, 2, 128, 128),    # multiple M tiles (online softmax carry)
])
def test_flash_gat_fused_matches_reference(n, m, d, heads, f, tile_m, mxu):
    from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat_fused,
                                                    flash_gat_fused_reference)
    rng = np.random.default_rng(0)
    hf = heads * f
    x = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, hf)).astype(np.float32) / np.sqrt(d))
    b = jnp.asarray(rng.normal(size=(hf,)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, m)) > 0.4)
    mask = mask.at[1].set(False)  # an all-masked destination -> exact zeros

    ref = flash_gat_fused_reference(x, w, b, er, attn, mask, heads)
    out = flash_gat_fused(x, w, b, er, attn, mask, heads, tile_n=8,
                          tile_m=tile_m, interpret=True, mxu=mxu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_gatv2_pallas_fused_backend_matches_dense():
    """End-to-end module check: backend='pallas_fused' == backend='dense'."""
    import jax as _jax
    from uav_bs_ctrl_tpu.models.encoders import gatv2, gatv2_init
    rng = np.random.default_rng(2)
    n, m, d_src, d_dst, heads, fph = 12, 40, 6, 10, 4, 16
    p = gatv2_init(_jax.random.PRNGKey(0), d_src, d_dst, heads, fph)
    x_src = jnp.asarray(rng.normal(size=(n, m, d_src)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(size=(n, d_dst)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, m)) > 0.5)

    dense = gatv2(p, x_src, x_dst, mask, heads, backend="dense")
    # interpret-mode pallas on CPU: thread through the kernel entry directly
    # by monkeypatching jit-static interpret is awkward; instead call the
    # fused kernel with interpret=True and replicate gatv2's residual+relu.
    from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat_fused
    ft = flash_gat_fused(x_src, p["fc_src"]["w"], p["fc_src"]["b"],
                         x_dst @ p["fc_dst"]["w"] + p["fc_dst"]["b"],
                         p["attn"], mask, heads, interpret=True)
    rst = ft + (x_dst @ p["res_fc"]["w"] + p["res_fc"]["b"])
    fused = _jax.nn.relu(rst)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               atol=2e-4, rtol=1e-4)


def test_flash_gat_fused_train_mxu_forward_and_grads():
    """MXU-contraction forward variant: parity + shared backward correctness."""
    from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat_fused_reference,
                                                    flash_gat_fused_train)
    rng = np.random.default_rng(7)
    n, m, d, heads, f = 10, 200, 5, 4, 64
    hf = heads * f
    x = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, hf)).astype(np.float32) / np.sqrt(d))
    b = jnp.asarray(rng.normal(size=(hf,)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask_b = jnp.asarray(rng.random((n, m)) > 0.4).at[1].set(False)
    mask_f = mask_b.astype(np.float32)
    cot = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))

    ref = flash_gat_fused_reference(x, w, b, er, attn, mask_b, heads)
    out = flash_gat_fused_train(x, w, b, er, attn, mask_f, heads,
                                0.2, 32, 128, True, True)  # interpret, mxu
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    def loss_dense(x_, w_, b_, er_, attn_):
        o = flash_gat_fused_reference(x_, w_, b_, er_, attn_, mask_b, heads)
        return jnp.sum(o * cot)

    def loss_mxu(x_, w_, b_, er_, attn_):
        o = flash_gat_fused_train(x_, w_, b_, er_, attn_, mask_f, heads,
                                  0.2, 32, 128, True, True)
        return jnp.sum(o * cot)

    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    g_mxu = jax.grad(loss_mxu, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    for gd, gp, name in zip(g_dense, g_mxu, ("x", "w", "b", "er", "attn")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   atol=5e-3, rtol=5e-4, err_msg=name)


@pytest.mark.parametrize("n,m,d,heads,f", [
    (10, 200, 5, 4, 64),        # padding in N and M
    (8, 256, 6, 2, 128),        # multiple M tiles (stat carry into backward)
])
def test_flash_gat_fused_train_grads_match_dense(n, m, d, heads, f):
    """Custom-VJP backward (Pallas) == jax.grad through the dense twin."""
    from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat_fused_reference,
                                                    flash_gat_fused_train)
    rng = np.random.default_rng(3)
    hf = heads * f
    x = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, hf)).astype(np.float32) / np.sqrt(d))
    b = jnp.asarray(rng.normal(size=(hf,)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask_b = jnp.asarray(rng.random((n, m)) > 0.4).at[1].set(False)
    mask_f = mask_b.astype(np.float32)
    cot = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))

    def loss_dense(x_, w_, b_, er_, attn_):
        out = flash_gat_fused_reference(x_, w_, b_, er_, attn_, mask_b, heads)
        return jnp.sum(out * cot)

    def loss_pallas(x_, w_, b_, er_, attn_):
        out = flash_gat_fused_train(x_, w_, b_, er_, attn_, mask_f, heads,
                                    0.2, 8, 128, True)   # interpret on CPU
        return jnp.sum(out * cot)

    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    for gd, gp, name in zip(g_dense, g_pallas, ("x", "w", "b", "er", "attn")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   atol=5e-3, rtol=5e-4, err_msg=name)


@pytest.mark.parametrize("mxu", [False, True])
def test_flash_gat_fused_train_bf16_parity(mxu):
    """bf16 inputs through the fused kernel: fwd + grads track the f32 dense
    twin at bf16-rounding tolerances (the kernel accumulates in f32 VMEM
    scratch, so errors come only from bf16 I/O rounding, not the reduction)."""
    from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat_fused_reference,
                                                    flash_gat_fused_train)
    rng = np.random.default_rng(3)
    n, m, d, heads, f = 12, 96, 6, 4, 32
    hf = heads * f
    x = rng.normal(size=(n, m, d)).astype(np.float32)
    w = (rng.normal(size=(d, hf)) / np.sqrt(d)).astype(np.float32)
    b = (0.1 * rng.normal(size=hf)).astype(np.float32)
    er = rng.normal(size=(n, hf)).astype(np.float32)
    attn = (0.5 * rng.normal(size=(heads, f))).astype(np.float32)
    mask_b = jnp.asarray(rng.random((n, m)) > 0.4).at[2].set(False)
    cot = rng.normal(size=(n, hf)).astype(np.float32)

    a16 = [jnp.asarray(v, jnp.bfloat16) for v in (x, w, b, er, attn)]
    mask16 = mask_b.astype(jnp.bfloat16)

    ref = flash_gat_fused_reference(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), jnp.asarray(er),
                                    jnp.asarray(attn), mask_b, heads)
    out = flash_gat_fused_train(*a16, mask16, heads, 0.2, 8, 128, True, mxu)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=2e-2)

    def loss16(x_, w_):
        o = flash_gat_fused_train(x_, w_, a16[2], a16[3], a16[4], mask16,
                                  heads, 0.2, 8, 128, True, mxu)
        return jnp.sum(o.astype(jnp.float32) * cot)

    def loss32(x_, w_):
        o = flash_gat_fused_reference(x_, w_, jnp.asarray(b), jnp.asarray(er),
                                      jnp.asarray(attn), mask_b, heads)
        return jnp.sum(o * cot)

    g16 = jax.grad(loss16, argnums=(0, 1))(a16[0], a16[1])
    g32 = jax.grad(loss32, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    for gp, gd, name in zip(g16, g32, ("x", "w")):
        scale = np.max(np.abs(np.asarray(gd))) + 1e-6
        rel = np.max(np.abs(np.asarray(gp, np.float32) - np.asarray(gd))) / scale
        assert rel < 0.08, f"grad {name} rel err {rel:.3f} (mxu={mxu})"


@pytest.mark.parametrize("n,m,need_dx", [
    (16, 7, False),    # 'near'-relation slot count: adaptive tile_m -> 8
    (16, 50, False),   # 'seen'-relation slot count: adaptive tile_m -> 56
    (16, 50, True),
])
def test_flash_gat_fused_train_small_m_and_need_dx(n, m, need_dx):
    """Flagship slot counts (adaptive tile_m < 128) + the no-dx backward.

    need_dx=False must still produce exact param/er/attn grads and return a
    zero obs cotangent (the training update never consumes it).
    """
    from uav_bs_ctrl_tpu.ops.pallas_kernels import (flash_gat_fused_reference,
                                                    flash_gat_fused_train)
    rng = np.random.default_rng(11)
    d, heads, f = 4, 4, 64
    hf = heads * f
    x = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, hf)).astype(np.float32) / np.sqrt(d))
    b = jnp.asarray(rng.normal(size=(hf,)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(heads, f)).astype(np.float32))
    mask_b = jnp.asarray(rng.random((n, m)) > 0.4).at[1].set(False)
    mask_f = mask_b.astype(np.float32)
    cot = jnp.asarray(rng.normal(size=(n, hf)).astype(np.float32))

    ref = flash_gat_fused_reference(x, w, b, er, attn, mask_b, heads)
    out = flash_gat_fused_train(x, w, b, er, attn, mask_f, heads,
                                0.2, 8, 128, True, True, need_dx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    def loss_dense(x_, w_, b_, er_, attn_):
        o = flash_gat_fused_reference(x_, w_, b_, er_, attn_, mask_b, heads)
        return jnp.sum(o * cot)

    def loss_pallas(x_, w_, b_, er_, attn_):
        o = flash_gat_fused_train(x_, w_, b_, er_, attn_, mask_f, heads,
                                  0.2, 8, 128, True, True, need_dx)
        return jnp.sum(o * cot)

    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w, b, er, attn)
    for k, (gd, gp, name) in enumerate(zip(g_dense, g_pallas,
                                           ("x", "w", "b", "er", "attn"))):
        if name == "x" and not need_dx:
            assert not np.any(np.asarray(gp)), "no-dx path must return zeros"
            continue
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   atol=5e-3, rtol=5e-4, err_msg=name)
