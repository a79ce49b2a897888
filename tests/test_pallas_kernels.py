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
