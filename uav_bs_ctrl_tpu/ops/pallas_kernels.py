"""Pallas TPU kernels for heterograph attention at swarm scale.

``flash_gat``: fused GATv2 attention — score computation
(``a . LeakyReLU(el + er)``), masked per-destination softmax, and weighted
source aggregation — in one kernel with ONLINE (flash-style) softmax.  The
XLA path materializes the ``[N, M, H]`` score/alpha tensors and the
``[N, M, H, F]`` broadcast product in HBM; this kernel streams source blocks
through VMEM and keeps only ``[TILE_N, H]`` running max/denominator and the
``[TILE_N, H*F]`` accumulator on-chip, so HBM traffic drops from
O(N*M*H*F) to O(N*M*(HF_src)) reads + O(N*HF) writes.

Grid: (N / TILE_N, M / TILE_M); the M axis iterates innermost and
sequentially on TPU, so VMEM scratch carries the online-softmax state across
M blocks of the same destination tile.

Semantics contract is identical to ``ops.masked.masked_softmax`` composed
with the weighted sum in ``models.encoders.gatv2`` (all-masked rows -> 0),
and is validated against that dense path in tests (interpret mode on CPU,
compiled on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30

# Hardware-tuned row-tile sizes per gat_backend (single place to re-tune —
# e.g. for a bf16 variant).  The MXU variant amortizes its block-diagonal
# matmuls over larger row tiles (hardware A/B, benchmarks/RESULTS.md:
# tile_n 8/16/32 -> 16.59/15.56/15.06 ms at 4096x800x(4x64) f32); the VPU
# variant's multiply+reduce contractions see no benefit past 8.
GAT_TILE_N = {"pallas_fused": 8, "pallas_fused_mxu": 32}


def _sublane(dtype):
    """Second-minor tiling granule for a dtype on TPU (8 f32, 16 bf16)."""
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _mxu_precision(dtype):
    """Precision for native-dtype MXU dots inside the kernels.

    f32 operands must force true-f32 passes: DEFAULT lowers an f32 matmul to
    bf16 MXU passes (measured 3.8e-2 grad error vs the dense twin at the
    flagship shape on hardware).  bf16 operands keep DEFAULT — that IS the
    native full-rate mode, with f32 accumulation via preferred_element_type.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _effective_tile_m(m, tile_m, dtype):
    """Shrink the source-slot tile to the actual slot count (sublane-rounded).

    The flagship relations have tiny slot axes (M=50 'seen', K=7 'near');
    padding them to the historical tile_m=128 multiplied every contraction's
    work by 2.6x / 18x respectively — the round-4 "forward 15x above its
    matmul bound" mystery (benchmarks/RESULTS.md round-5).  Tiling only pays
    when M exceeds one tile; otherwise one j-block sized to the sublane-
    rounded slot count does the minimum padded work.
    """
    import os
    forced = os.environ.get("UAVBS_GAT_TILE_M")
    if forced:
        return int(forced)  # hardware-sweep / fallback escape hatch
    granule = _sublane(dtype)
    return min(tile_m, max(granule, ((m + granule - 1) // granule) * granule))


def _flash_gat_kernel(el_ref, er_ref, attn_ref, mask_ref, out_ref,
                      m_scr, l_scr, acc_scr, *, n_heads, negative_slope):
    """Online-softmax GAT block.

    Mosaic lowering constraints shape this kernel: no reshapes that split the
    lane (last) dimension and no batched/multi-dim dot_generals — heads are
    processed with a static Python loop over lane-dim slices, and every
    contraction is broadcast-multiply + axis reduction.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    el = el_ref[:]                    # [TN, TM, H*F]
    er = er_ref[:]                    # [TN, H*F]
    # f32 load: Mosaic rejects minor-dim inserts (mask[:, :, None]) on
    # 16-bit types, so a bf16 mask must be widened before broadcasting.
    mask = mask_ref[:].astype(jnp.float32)  # [TN, TM] (float 0/1)

    tn, tm, hf = el.shape
    f = hf // n_heads

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for h in range(n_heads):
        sl = slice(h * f, (h + 1) * f)
        el_h = el[:, :, sl]                                      # [TN, TM, F]
        er_h = er[:, sl]                                         # [TN, F]
        attn_h = attn_ref[h, :]                                  # [F]

        e = el_h + er_h[:, None, :]
        e = jnp.where(e >= 0, e, negative_slope * e)
        scores = jnp.sum(e * attn_h[None, None, :], axis=-1)     # [TN, TM]
        scores = jnp.where(mask > 0, scores, _NEG_BIG)

        m_old = m_scr[:, h:h + 1]                                # [TN, 1]
        m_blk = jnp.max(scores, axis=1, keepdims=True)           # [TN, 1]
        m_new = jnp.maximum(m_old, m_blk)
        # Keep fully-masked rows at shift 0 to avoid inf - inf.
        shift = jnp.where(m_new <= _NEG_BIG / 2, 0.0, m_new)

        p = jnp.exp(scores - shift)                              # [TN, TM]
        p = jnp.where(mask > 0, p, 0.0)

        scale = jnp.exp(jnp.where(m_old <= _NEG_BIG / 2, 0.0, m_old) - shift)

        l_scr[:, h:h + 1] = l_scr[:, h:h + 1] * scale + jnp.sum(p, axis=1,
                                                                keepdims=True)
        contrib = jnp.sum(p[:, :, None] * el_h, axis=1)          # [TN, F]
        acc_scr[:, sl] = acc_scr[:, sl] * scale + contrib
        m_scr[:, h:h + 1] = m_new

    @pl.when(j == n_j - 1)
    def _finalize():
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            denom = jnp.maximum(l_scr[:, h:h + 1], 1e-30)        # [TN, 1]
            out_ref[:, sl] = acc_scr[:, sl] / denom


@functools.partial(jax.jit, static_argnames=("n_heads", "negative_slope",
                                             "tile_n", "tile_m", "interpret"))
def flash_gat(el, er, attn, mask, n_heads, negative_slope=0.2,
              tile_n=8, tile_m=128, interpret=False):
    """Fused masked GATv2 attention + aggregation.

    el:   [N, M, H*F] transformed source features per destination slot
    er:   [N, H*F]    transformed destination features
    attn: [H, F]      attention vector per head
    mask: [N, M]      slot validity
    Returns [N, H*F] = sum_m softmax_m(a . LeakyReLU(el + er)) * el.
    """
    n, m, hf = el.shape
    assert hf % n_heads == 0
    tile_m = _effective_tile_m(m, tile_m, el.dtype)

    # Pad N and M to tile multiples (padded slots are masked out).
    pad_n = (-n) % tile_n
    pad_m = (-m) % tile_m
    if pad_n or pad_m:
        el = jnp.pad(el, ((0, pad_n), (0, pad_m), (0, 0)))
        er = jnp.pad(er, ((0, pad_n), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_n), (0, pad_m)))
    np_, mp_ = el.shape[0], el.shape[1]

    mask_f = mask.astype(el.dtype)
    grid = (np_ // tile_n, mp_ // tile_m)

    out = pl.pallas_call(
        functools.partial(_flash_gat_kernel, n_heads=n_heads,
                          negative_slope=negative_slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_m, hf), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_heads, hf // n_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, hf), el.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, hf), jnp.float32),
        ],
        interpret=interpret,
    )(el, er, attn, mask_f)

    return out[:n]


def _flash_gat_fused_kernel(x_ref, w_ref, b_ref, er_ref, attn_ref, mask_ref,
                            *refs, n_heads, negative_slope, mxu=False):
    """Online-softmax GAT block with the source projection fused in.

    Identical contract to ``_flash_gat_kernel`` except ``el`` is computed
    on-chip as ``x_blk @ W_src + b`` — the [TN, TM, H*F] transformed-source
    tensor lives only in VMEM, never HBM.  Per-edge HBM read traffic drops
    from H*F floats (256 in the exp configs) to d_src floats (the raw
    neighborhood feature width, ~4-8), which is where both the dense and the
    unfused-Pallas paths were bandwidth-bound (benchmarks/RESULTS.md swarm
    A/B).  The matmul itself is MXU work added against spare compute.

    ``mxu=True`` replaces the per-head VPU multiply+reduce contractions with
    MXU dot_generals: scores via one block-diagonal attention matmul
    ``[TN*TM, HF] @ [HF, H]`` (the extra ``attn_blk`` input), aggregation via
    a single-batch dot_general ``p x el -> [TN, H, HF]`` (Mosaic rejects only
    multi-batch dots; the bwd kernel already lowers plain dot_generals).
    """
    if mxu:
        (attn_blk_ref, out_ref, mstat_ref, lstat_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        out_ref, mstat_ref, lstat_ref, m_scr, l_scr, acc_scr = refs
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    x = x_ref[:]                      # [TN, TM, D]
    w = w_ref[:]                      # [D, H*F]
    b = b_ref[:]                      # [1, H*F]
    # f32 load: Mosaic rejects minor-dim inserts (mask[:, :, None]) on
    # 16-bit types, so a bf16 mask must be widened before broadcasting.
    mask = mask_ref[:].astype(jnp.float32)  # [TN, TM] (float 0/1)

    tn, tm, d = x.shape
    hf = w.shape[1]
    f = hf // n_heads

    # Fused projection: NATIVE-dtype operands on the MXU with f32 accumulate
    # (a bf16 x bf16 matmul runs at full MXU rate; upcasting first would halve
    # it).  Reshape only merges the leading (sublane) dims — Mosaic rejects
    # lane-splitting reshapes, not this one.  UAVBS_GAT_UPCAST_DOTS=1 restores
    # the historical upcast-to-f32 operands (hardware A/B lever, RESULTS.md).
    import os as _os
    cdt = jnp.float32 if _os.environ.get("UAVBS_GAT_UPCAST_DOTS") else x.dtype
    # Precision keys off the TRUE input dtype: real-f32 training needs HIGHEST
    # (DEFAULT lowers to bf16 passes); bf16 runs — including the upcast A/B
    # lever, which emulates the r4 behavior — keep DEFAULT.
    prec = _mxu_precision(x.dtype)
    el = jax.lax.dot_general(
        x.reshape(tn * tm, d).astype(cdt), w.astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    el = (el + b.astype(jnp.float32)).reshape(tn, tm, hf)
    er = er_ref[:].astype(jnp.float32)                       # [TN, H*F]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if mxu:
        ablk = attn_blk_ref[:]                               # [HF, H]
        e = el + er[:, None, :]                              # [TN, TM, HF]
        e = jnp.where(e >= 0, e, negative_slope * e)
        scores = jax.lax.dot_general(
            e.reshape(tn * tm, hf).astype(cdt), ablk.astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).reshape(tn, tm, n_heads)
        scores = jnp.where(mask[:, :, None] > 0, scores, _NEG_BIG)

        m_old = m_scr[:]                                     # [TN, H]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=1))
        shift = jnp.where(m_new <= _NEG_BIG / 2, 0.0, m_new)

        p = jnp.exp(scores - shift[:, None, :])
        p = jnp.where(mask[:, :, None] > 0, p, 0.0)          # [TN, TM, H]

        scale = jnp.exp(jnp.where(m_old <= _NEG_BIG / 2, 0.0, m_old) - shift)
        l_scr[:] = l_scr[:] * scale + jnp.sum(p, axis=1)

        # Batch n, contract m: [TN, H, HF]; head h's slice of interest is
        # full[:, h, h*F:(h+1)*F] (the off-diagonal blocks are H-1/H wasted
        # MACs, but the MXU eats them against the VPU's reduce latency).
        full = jax.lax.dot_general(p.astype(cdt), el.astype(cdt),
                                   (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            acc_scr[:, sl] = (acc_scr[:, sl] * scale[:, h:h + 1]
                              + full[:, h, sl])
        m_scr[:] = m_new
    else:
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            el_h = el[:, :, sl]                              # [TN, TM, F]
            er_h = er[:, sl]                                 # [TN, F]
            attn_h = attn_ref[h, :].astype(jnp.float32)      # [F]

            e = el_h + er_h[:, None, :]
            e = jnp.where(e >= 0, e, negative_slope * e)
            scores = jnp.sum(e * attn_h[None, None, :], axis=-1)  # [TN, TM]
            scores = jnp.where(mask > 0, scores, _NEG_BIG)

            m_old = m_scr[:, h:h + 1]
            m_blk = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m_old, m_blk)
            shift = jnp.where(m_new <= _NEG_BIG / 2, 0.0, m_new)

            p = jnp.exp(scores - shift)
            p = jnp.where(mask > 0, p, 0.0)

            scale = jnp.exp(jnp.where(m_old <= _NEG_BIG / 2, 0.0, m_old)
                            - shift)

            l_scr[:, h:h + 1] = (l_scr[:, h:h + 1] * scale
                                 + jnp.sum(p, axis=1, keepdims=True))
            contrib = jnp.sum(p[:, :, None] * el_h, axis=1)
            acc_scr[:, sl] = acc_scr[:, sl] * scale + contrib
            m_scr[:, h:h + 1] = m_new

    @pl.when(j == n_j - 1)
    def _finalize():
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            denom = jnp.maximum(l_scr[:, h:h + 1], 1e-30)
            out_ref[:, sl] = (acc_scr[:, sl] / denom).astype(out_ref.dtype)
        # Softmax stats for the backward pass (flash-attention style).
        mstat_ref[:] = m_scr[:]
        lstat_ref[:] = l_scr[:]


@functools.partial(jax.jit, static_argnames=("n_heads", "negative_slope",
                                             "tile_n", "tile_m", "interpret",
                                             "return_stats", "mxu"))
def flash_gat_fused(x_src, w_src, b_src, er, attn, mask, n_heads,
                    negative_slope=0.2, tile_n=8, tile_m=128, interpret=None,
                    return_stats=False, mxu=False):
    """Fused projection + masked GATv2 attention + aggregation.

    x_src: [N, M, D] RAW source features per destination slot
    w_src: [D, H*F], b_src: [H*F]  — the fc_src linear (projected on-chip)
    er:    [N, H*F]  transformed destination features
    attn:  [H, F]    attention vector per head
    mask:  [N, M]    slot validity
    mxu:   route the score/aggregation contractions through MXU dot_generals
           (block-diagonal attention matmul) instead of VPU multiply+reduce
    Returns [N, H*F]; same math as ``flash_gat(x_src @ w_src + b_src, ...)``
    but the projected tensor is never materialized in HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m, d = x_src.shape
    hf = w_src.shape[1]
    assert hf % n_heads == 0
    tile_m = _effective_tile_m(m, tile_m, x_src.dtype)

    pad_n = (-n) % tile_n
    pad_m = (-m) % tile_m
    if pad_n or pad_m:
        x_src = jnp.pad(x_src, ((0, pad_n), (0, pad_m), (0, 0)))
        er = jnp.pad(er, ((0, pad_n), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_n), (0, pad_m)))
    np_, mp_ = x_src.shape[0], x_src.shape[1]

    mask_f = mask.astype(x_src.dtype)
    grid = (np_ // tile_n, mp_ // tile_m)

    in_specs = [
        pl.BlockSpec((tile_n, tile_m, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, hf), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hf), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_heads, hf // n_heads), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_src, w_src, b_src.reshape(1, hf), er, attn, mask_f]
    if mxu:
        # Block-diagonal attention: attn_blk[h*F+f, h] = attn[h, f].
        f = hf // n_heads
        attn_blk = (attn[:, :, None]
                    * jnp.eye(n_heads, dtype=attn.dtype)[:, None, :])
        operands.append(attn_blk.reshape(hf, n_heads))
        in_specs.append(pl.BlockSpec((hf, n_heads), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_flash_gat_fused_kernel, n_heads=n_heads,
                          negative_slope=negative_slope, mxu=mxu),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_heads), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_heads), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, hf), x_src.dtype),
            jax.ShapeDtypeStruct((np_, n_heads), jnp.float32),
            jax.ShapeDtypeStruct((np_, n_heads), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, hf), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out, mstat, lstat = out
    if return_stats:
        return out[:n], mstat[:n], lstat[:n]
    return out[:n]


def flash_gat_fused_reference(x_src, w_src, b_src, er, attn, mask, n_heads,
                              negative_slope=0.2):
    """Dense XLA twin of ``flash_gat_fused`` (materializes el)."""
    el = x_src @ w_src + b_src
    return flash_gat_reference(el, er, attn, mask, n_heads, negative_slope)


def _flash_gat_fused_bwd_kernel(*refs, n_heads, negative_slope, mxu, need_dx):
    refs = list(refs)
    (x_ref, w_ref, b_ref, er_ref, attn_ref, mask_ref, g_ref, dvec_ref,
     mstat_ref, lstat_ref) = refs[:10]
    rest = refs[10:]
    attn_blk_ref = rest.pop(0) if mxu else None
    dx_ref = rest.pop(0) if need_dx else None
    dw_ref, db_ref, der_ref, dattn_ref = rest
    """Flash-style backward: recompute el/alpha per block, accumulate grads.

    Cotangent math (g = dL/dout, per head h; alpha the masked softmax,
    z = el + er, D[n,h] = sum_f g_h . out_h precomputed in XLA):

      d_alpha = sum_f g_h * el_h            d_s = alpha * (d_alpha - D)
      d_z     = d_s[...,None] * attn_h * leaky'(z)
      d_el    = alpha * g_h + d_z           d_er = sum_m d_z
      d_attn  = sum_{n,m} d_s * leaky(z)    d_x = d_el @ w.T
      d_w     = x^T d_el                    d_b = sum d_el

    Masked slots have alpha = 0 and d_s = 0, so every gradient term vanishes
    there without extra branches.  All accumulators are f32; the i/j grid is
    sequential on TPU, so constant-index output blocks (dw/db/dattn) and the
    j-revisited der block accumulate safely in VMEM.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    import os as _os
    x = x_ref[:]                       # [TN, TM, D]  (native dtype — MXU dots
    cdt = (jnp.float32                 #  run bf16 when the caller trains bf16;
           if _os.environ.get("UAVBS_GAT_UPCAST_DOTS") else x.dtype)
    prec = _mxu_precision(x.dtype)     # true-dtype precision (see fwd kernel)
    w = w_ref[:]                       # [D, HF]
    b = b_ref[:].astype(jnp.float32)   # [1, HF]
    mask = mask_ref[:].astype(jnp.float32)  # [TN, TM] (bf16-safe, see fwd)
    g = g_ref[:].astype(jnp.float32)   # [TN, HF]
    er = er_ref[:].astype(jnp.float32)
    dvec = dvec_ref[:]                 # [TN, H]  (f32)
    mstat = mstat_ref[:]               # [TN, H]
    lstat = lstat_ref[:]               # [TN, H]

    tn, tm, d = x.shape
    hf = w.shape[1]
    f = hf // n_heads

    @pl.when((i == 0) & (j == 0))
    def _init_global():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dattn_ref[:] = jnp.zeros_like(dattn_ref)

    @pl.when(j == 0)
    def _init_row():
        der_ref[:] = jnp.zeros_like(der_ref)

    x_flat = x.reshape(tn * tm, d).astype(cdt)
    el = jax.lax.dot_general(x_flat, w.astype(cdt), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    el = (el + b).reshape(tn, tm, hf)

    if mxu:
        # MXU variant: every per-head F-contraction becomes a block-diagonal
        # matmul, mirroring the forward (benchmarks/RESULTS.md) — scores and
        # the d_s*attn / alpha head-broadcasts as [TNM, HF]x[HF, H] (and
        # transposed-contraction) dot_generals, dattn as one [TNM, H]^T x
        # [TNM, HF], and d_alpha as a single-batch dot_general against a
        # block-diagonalized g operand built from an iota mask.  Off-diagonal
        # blocks are (H-1)/H wasted MACs; the MXU eats them against the VPU's
        # reduce latency (same trade the forward measured at 1.7x).
        ablk = attn_blk_ref[:].astype(cdt)                    # [HF, H]
        z = el + er[:, None, :]                               # [TN, TM, HF]
        lz = jnp.where(z >= 0, z, negative_slope * z)
        lz_flat = lz.reshape(tn * tm, hf).astype(cdt)
        scores = jax.lax.dot_general(
            lz_flat, ablk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).reshape(tn, tm, n_heads)

        shift = jnp.where(mstat <= _NEG_BIG / 2, 0.0, mstat)  # [TN, H]
        p = jnp.where(mask[:, :, None] > 0,
                      jnp.exp(scores - shift[:, None, :]), 0.0)
        alpha = p / jnp.maximum(lstat, 1e-30)[:, None, :]     # [TN, TM, H]

        blkmask = (jax.lax.broadcasted_iota(jnp.int32, (hf, n_heads), 0) // f
                   == jax.lax.broadcasted_iota(jnp.int32, (hf, n_heads), 1)
                   ).astype(cdt)                              # [HF, H]
        # Insert the minor dim while still f32 (Mosaic rejects non-no-op
        # minor-dim inserts on 16-bit vectors), then cast for the MXU dot.
        g_blk = (g[:, :, None] * blkmask.astype(jnp.float32)[None]
                 ).astype(cdt)                                # [TN, HF, H]
        d_alpha = jax.lax.dot_general(
            el.astype(cdt), g_blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                    # [TN, TM, H]
        d_s = alpha * (d_alpha - dvec[:, None, :])            # [TN, TM, H]

        d_s_flat = d_s.reshape(tn * tm, n_heads).astype(cdt)
        # (d_s @ blk-diag attn^T)[nm, hf] = d_s[nm, head(hf)] * attn[head, f]
        d_s_attn = jax.lax.dot_general(
            d_s_flat, ablk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).reshape(tn, tm, hf)
        dleaky = jnp.where(z >= 0, 1.0, negative_slope)
        d_z = d_s_attn * dleaky                               # [TN, TM, HF]

        alpha_b = jax.lax.dot_general(
            alpha.reshape(tn * tm, n_heads).astype(cdt), blkmask,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).reshape(tn, tm, hf)
        d_el = alpha_b * g[:, None, :] + d_z
        der_ref[:] += jnp.sum(d_z, axis=1)

        dfull = jax.lax.dot_general(d_s_flat, lz_flat,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)  # [H, HF]
        for h in range(n_heads):
            dattn_ref[h:h + 1, :] += dfull[h:h + 1, h * f:(h + 1) * f]
    else:
        d_el = jnp.zeros((tn, tm, hf), jnp.float32)
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            el_h = el[:, :, sl]                                  # [TN, TM, F]
            er_h = er[:, sl]                                     # [TN, F]
            attn_h = attn_ref[h, :].astype(jnp.float32)          # [F]
            g_h = g[:, sl]                                       # [TN, F]

            z = el_h + er_h[:, None, :]
            lz = jnp.where(z >= 0, z, negative_slope * z)
            scores = jnp.sum(lz * attn_h[None, None, :], axis=-1)  # [TN, TM]

            m_h = mstat[:, h:h + 1]
            shift = jnp.where(m_h <= _NEG_BIG / 2, 0.0, m_h)
            p = jnp.where(mask > 0, jnp.exp(scores - shift), 0.0)
            alpha = p / jnp.maximum(lstat[:, h:h + 1], 1e-30)    # [TN, TM]

            d_alpha = jnp.sum(g_h[:, None, :] * el_h, axis=-1)   # [TN, TM]
            d_s = alpha * (d_alpha - dvec[:, h:h + 1])           # [TN, TM]

            dleaky = jnp.where(z >= 0, 1.0, negative_slope)
            d_z = d_s[:, :, None] * attn_h[None, None, :] * dleaky  # [TN, TM, F]

            d_el = d_el.at[:, :, sl].set(alpha[:, :, None] * g_h[:, None, :] + d_z)
            der_ref[:, sl] += jnp.sum(d_z, axis=1)
            # Two-step reduction keeps every intermediate >= 2-D for Mosaic.
            da_h = jnp.sum(jnp.sum(d_s[:, :, None] * lz, axis=1), axis=0,
                           keepdims=True)                        # [1, F]
            dattn_ref[h:h + 1, :] += da_h

    d_el_flat = d_el.reshape(tn * tm, hf)
    d_el_c = d_el_flat.astype(cdt)
    if need_dx:
        # The obs cotangent: dead weight when the sources are observation
        # leaves (the training update differentiates params only) — the
        # encoder path calls with need_dx=False and skips both the matmul
        # and the [N, M, D] HBM write.
        dx = jax.lax.dot_general(d_el_c, w.astype(cdt),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        dx_ref[:] = dx.reshape(tn, tm, d).astype(dx_ref.dtype)
    dw_ref[:] += jax.lax.dot_general(x_flat, d_el_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
    db_ref[:] += jnp.sum(d_el_flat, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def flash_gat_fused_train(x_src, w_src, b_src, er, attn, mask_f, n_heads,
                          negative_slope=0.2, tile_n=8, tile_m=128,
                          interpret=None, mxu=False, need_dx=True):
    """Differentiable ``flash_gat_fused`` (Pallas forward AND backward).

    ``mask_f`` must be a float 0/1 array (gets a zero cotangent).  Training
    use-site: ``models.encoders.gatv2`` with ``backend='pallas_fused'`` (or
    ``'pallas_fused_mxu'`` for the MXU-contraction forward — 1.32x over XLA
    dense at swarm scale on hardware; the flash-recompute backward is shared).
    ``need_dx=False`` skips the source-feature cotangent entirely (returns
    symbolic zeros for it) — correct whenever ``x_src`` is an observation
    leaf that is never differentiated, as in every training update.
    """
    return flash_gat_fused(x_src, w_src, b_src, er, attn, mask_f, n_heads,
                           negative_slope=negative_slope, tile_n=tile_n,
                           tile_m=tile_m, interpret=interpret, mxu=mxu)


def _fgf_fwd(x_src, w_src, b_src, er, attn, mask_f, n_heads, negative_slope,
             tile_n, tile_m, interpret, mxu, need_dx):
    out, mstat, lstat = flash_gat_fused(
        x_src, w_src, b_src, er, attn, mask_f, n_heads,
        negative_slope=negative_slope, tile_n=tile_n, tile_m=tile_m,
        interpret=interpret, return_stats=True, mxu=mxu)
    return out, (x_src, w_src, b_src, er, attn, mask_f, out, mstat, lstat)


def _fgf_bwd(n_heads, negative_slope, tile_n, tile_m, interpret, mxu, need_dx,
             res, g):
    # The backward re-derives alpha from the forward's saved (mstat, lstat)
    # row statistics.  With mxu=True the recompute and cotangent contractions
    # ride the MXU as block-diagonal matmuls, matching the forward's engine.
    # The bwd block holds ~6 live [TN, TM, HF] f32 intermediates (z/lz/d_el/
    # d_z/alpha-broadcasts), 4x the forward's footprint — clamp its row tile
    # so VMEM stays under the 16 MB scoped limit (fwd keeps the larger tile).
    # With the slot-sized tile_m the footprint shrinks proportionally, so the
    # default clamp scales inversely (TN*TM ~ 1024 elements keeps the block
    # ~3 MB at HF=256 f32).  UAVBS_GAT_BWD_TILE overrides for hardware sweeps.
    import os as _os
    x_src, w_src, b_src, er, attn, mask_f, out, mstat, lstat = res
    tile_m = _effective_tile_m(x_src.shape[1], tile_m, x_src.dtype)
    default_tile_n = max(8, 1024 // tile_m)
    tile_n = min(tile_n, int(_os.environ.get("UAVBS_GAT_BWD_TILE",
                                             default_tile_n)))
    # Mosaic requires the second-to-last block dim be a multiple of 8 (the
    # 2D er/g/stat blocks are [tile_n, ...]); round down to the granule.
    tile_n = max(8, (tile_n // 8) * 8)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m, d = x_src.shape
    hf = w_src.shape[1]
    f = hf // n_heads

    # D[n,h] = sum_f g_h . out_h (tiny; cheaper in XLA than in-kernel).
    dvec = jnp.sum((g * out).astype(jnp.float32).reshape(n, n_heads, f),
                   axis=-1)

    pad_n = (-n) % tile_n
    pad_m = (-m) % tile_m
    if pad_n or pad_m:
        x_src = jnp.pad(x_src, ((0, pad_n), (0, pad_m), (0, 0)))
        mask_f = jnp.pad(mask_f, ((0, pad_n), (0, pad_m)))
        er = jnp.pad(er, ((0, pad_n), (0, 0)))
        g = jnp.pad(g, ((0, pad_n), (0, 0)))
        dvec = jnp.pad(dvec, ((0, pad_n), (0, 0)))
        # Padded rows: lstat=0 -> alpha=0; mstat=_NEG_BIG -> shift=0. Safe.
        mstat = jnp.pad(mstat, ((0, pad_n), (0, 0)),
                        constant_values=_NEG_BIG)
        lstat = jnp.pad(lstat, ((0, pad_n), (0, 0)))
    np_, mp_ = x_src.shape[0], x_src.shape[1]
    grid = (np_ // tile_n, mp_ // tile_m)

    bwd_in_specs_extra = []
    bwd_operands_extra = []
    if mxu:
        attn_blk = (attn[:, :, None]
                    * jnp.eye(n_heads, dtype=attn.dtype)[:, None, :])
        bwd_operands_extra.append(attn_blk.reshape(hf, n_heads))
        bwd_in_specs_extra.append(pl.BlockSpec((hf, n_heads),
                                               lambda i, j: (0, 0),
                                               memory_space=pltpu.VMEM))

    dx_specs = [pl.BlockSpec((tile_n, tile_m, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)] if need_dx else []
    dx_shapes = ([jax.ShapeDtypeStruct((np_, mp_, d), x_src.dtype)]
                 if need_dx else [])
    outs = pl.pallas_call(
        functools.partial(_flash_gat_fused_bwd_kernel, n_heads=n_heads,
                          negative_slope=negative_slope, mxu=mxu,
                          need_dx=need_dx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_m, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hf), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hf), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_heads, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_heads), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_heads), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_heads), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + bwd_in_specs_extra,
        out_specs=dx_specs + [
            pl.BlockSpec((d, hf), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hf), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_heads, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((d, hf), jnp.float32),
            jax.ShapeDtypeStruct((1, hf), jnp.float32),
            jax.ShapeDtypeStruct((np_, hf), jnp.float32),
            jax.ShapeDtypeStruct((n_heads, f), jnp.float32),
        ],
        interpret=interpret,
    )(x_src, w_src, b_src.reshape(1, hf), er, attn, mask_f, g, dvec,
      mstat, lstat, *bwd_operands_extra)

    if need_dx:
        dx, dw, db, der, dattn = outs
        dx = dx[:n, :m]
    else:
        dw, db, der, dattn = outs
        dx = jnp.zeros((n, m, d), x_src.dtype)
    return (dx, dw.astype(w_src.dtype), db[0].astype(b_src.dtype),
            der[:n].astype(er.dtype), dattn.astype(attn.dtype),
            jnp.zeros((n, m), mask_f.dtype))


flash_gat_fused_train.defvjp(_fgf_fwd, _fgf_bwd)


def flash_gat_reference(el, er, attn, mask, n_heads, negative_slope=0.2):
    """Dense XLA twin of ``flash_gat`` (same contract, materialized scores)."""
    n, m, hf = el.shape
    f = hf // n_heads
    e = el + er[:, None, :]
    e = jnp.where(e >= 0, e, negative_slope * e)
    scores = jnp.sum(e.reshape(n, m, n_heads, f) * attn, axis=-1)
    scores = jnp.where(mask[:, :, None], scores, _NEG_BIG)
    smax = jnp.max(scores, axis=1, keepdims=True)
    smax = jnp.where(smax <= _NEG_BIG / 2, 0.0, smax)
    p = jnp.where(mask[:, :, None], jnp.exp(scores - smax), 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=1), 1e-30)
    ft = jnp.einsum("nmh,nmhf->nhf", p, el.reshape(n, m, n_heads, f)) / denom[:, :, None]
    return ft.reshape(n, hf)
