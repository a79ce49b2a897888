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
    mask = mask_ref[:]                # [TN, TM] (float 0/1)

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
                            out_ref, m_scr, l_scr, acc_scr, *, n_heads,
                            negative_slope):
    """Online-softmax GAT block with the source projection fused in.

    Identical contract to ``_flash_gat_kernel`` except ``el`` is computed
    on-chip as ``x_blk @ W_src + b`` — the [TN, TM, H*F] transformed-source
    tensor lives only in VMEM, never HBM.  Per-edge HBM read traffic drops
    from H*F floats (256 in the exp configs) to d_src floats (the raw
    neighborhood feature width, ~4-8), which is where both the dense and the
    unfused-Pallas paths were bandwidth-bound (benchmarks/RESULTS.md swarm
    A/B).  The matmul itself is MXU work added against spare compute.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    x = x_ref[:]                      # [TN, TM, D]
    w = w_ref[:]                      # [D, H*F]
    b = b_ref[:]                      # [1, H*F]
    mask = mask_ref[:]                # [TN, TM] (float 0/1)

    tn, tm, d = x.shape
    hf = w.shape[1]
    f = hf // n_heads

    # Fused projection (f32 accumulate on the MXU). Reshape only merges the
    # leading (sublane) dims — Mosaic rejects lane-splitting reshapes, not
    # this one.
    el = jax.lax.dot_general(
        x.reshape(tn * tm, d).astype(jnp.float32), w.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    el = (el + b.astype(jnp.float32)).reshape(tn, tm, hf)
    er = er_ref[:].astype(jnp.float32)                       # [TN, H*F]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for h in range(n_heads):
        sl = slice(h * f, (h + 1) * f)
        el_h = el[:, :, sl]                                  # [TN, TM, F]
        er_h = er[:, sl]                                     # [TN, F]
        attn_h = attn_ref[h, :].astype(jnp.float32)          # [F]

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

        scale = jnp.exp(jnp.where(m_old <= _NEG_BIG / 2, 0.0, m_old) - shift)

        l_scr[:, h:h + 1] = l_scr[:, h:h + 1] * scale + jnp.sum(p, axis=1,
                                                                keepdims=True)
        contrib = jnp.sum(p[:, :, None] * el_h, axis=1)
        acc_scr[:, sl] = acc_scr[:, sl] * scale + contrib
        m_scr[:, h:h + 1] = m_new

    @pl.when(j == n_j - 1)
    def _finalize():
        for h in range(n_heads):
            sl = slice(h * f, (h + 1) * f)
            denom = jnp.maximum(l_scr[:, h:h + 1], 1e-30)
            out_ref[:, sl] = (acc_scr[:, sl] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "negative_slope",
                                             "tile_n", "tile_m", "interpret"))
def flash_gat_fused(x_src, w_src, b_src, er, attn, mask, n_heads,
                    negative_slope=0.2, tile_n=8, tile_m=128, interpret=False):
    """Fused projection + masked GATv2 attention + aggregation.

    x_src: [N, M, D] RAW source features per destination slot
    w_src: [D, H*F], b_src: [H*F]  — the fc_src linear (projected on-chip)
    er:    [N, H*F]  transformed destination features
    attn:  [H, F]    attention vector per head
    mask:  [N, M]    slot validity
    Returns [N, H*F]; same math as ``flash_gat(x_src @ w_src + b_src, ...)``
    but the projected tensor is never materialized in HBM.
    """
    n, m, d = x_src.shape
    hf = w_src.shape[1]
    assert hf % n_heads == 0

    pad_n = (-n) % tile_n
    pad_m = (-m) % tile_m
    if pad_n or pad_m:
        x_src = jnp.pad(x_src, ((0, pad_n), (0, pad_m), (0, 0)))
        er = jnp.pad(er, ((0, pad_n), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_n), (0, pad_m)))
    np_, mp_ = x_src.shape[0], x_src.shape[1]

    mask_f = mask.astype(x_src.dtype)
    grid = (np_ // tile_n, mp_ // tile_m)

    out = pl.pallas_call(
        functools.partial(_flash_gat_fused_kernel, n_heads=n_heads,
                          negative_slope=negative_slope),
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
            pl.BlockSpec((n_heads, hf // n_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, hf), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, hf), x_src.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, n_heads), jnp.float32),
            pltpu.VMEM((tile_n, hf), jnp.float32),
        ],
        interpret=interpret,
    )(x_src, w_src, b_src.reshape(1, hf), er, attn, mask_f)

    return out[:n]


def flash_gat_fused_reference(x_src, w_src, b_src, er, attn, mask, n_heads,
                              negative_slope=0.2):
    """Dense XLA twin of ``flash_gat_fused`` (materializes el)."""
    el = x_src @ w_src + b_src
    return flash_gat_reference(el, er, attn, mask, n_heads, negative_slope)


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


# --------------------------------------------------------------------------- #
# Padded-CSR segment-reduce SpMM


def _csr_segment_sum_kernel(offsets_ref, values_ref, out_ref, *, edge_block):
    """Per-destination sum over a CSR edge run.

    Grid is (N,); ``offsets_ref`` is scalar-prefetched so each program knows
    its [start, end) run before the body executes.  Edge runs are consumed in
    fixed ``edge_block`` strides with an index mask (variable degrees under
    static shapes).
    """
    i = pl.program_id(0)
    start = offsets_ref[i]
    end = offsets_ref[i + 1]

    eb = edge_block
    d = values_ref.shape[1]
    n_blocks = pl.cdiv(values_ref.shape[0], eb)

    def body(b, acc):
        base = b * eb
        blk = values_ref[pl.ds(base, eb), :]                     # [EB, D]
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (eb, 1), 0)
        valid = (idx >= start) & (idx < end)
        return acc + jnp.sum(jnp.where(valid, blk, 0.0), axis=0)

    # Only iterate blocks that can intersect [start, end).
    first = start // eb
    last = pl.cdiv(end, eb)

    def guarded(b, acc):
        return jax.lax.cond((b >= first) & (b < last),
                            lambda a: body(b, a), lambda a: a, acc)

    acc = jax.lax.fori_loop(0, n_blocks, guarded, jnp.zeros((d,), jnp.float32))
    out_ref[0, :] = acc


def csr_segment_sum(values, row_offsets, num_dst, edge_block=128, interpret=False):
    """Pallas padded-CSR segment-sum: out[i] = sum of values rows in run i.

    values:      [E, D] edge values sorted by destination (padding rows are
                 simply not covered by any run).
    row_offsets: [N+1] int32 CSR offsets into ``values``.
    Returns [N, D].  VMEM-resident values (E*D*4 bytes should fit in ~8 MB);
    larger graphs should shard destinations first (see parallel.graph_parallel).
    """
    e, d = values.shape
    # Pad E to a block multiple: pl.ds clamps out-of-range slices, which would
    # misattribute rows of the final partial block.
    pad_e = (-e) % edge_block
    if pad_e:
        values = jnp.pad(values, ((0, pad_e), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_dst,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_csr_segment_sum_kernel, edge_block=edge_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_dst, d), jnp.float32),
        interpret=interpret,
    )(row_offsets.astype(jnp.int32), values.astype(jnp.float32))
