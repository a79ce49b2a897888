"""Fused recurrent-step megakernel: TarMAC comm + GRU + (dueling) Q head.

The flagship scan-BPTT update is latency-bound: at B=256 each of the ~200
sequential scan steps costs ~0.85 ms while its actual compute is ~10 us of
MXU work (benchmarks/RESULTS.md round-3 roofline; hoisting, unrolling and
scan-merging all refuted as levers).  The remaining lever is collapsing the
per-step kernel CHAIN — the reference's recurrent step (TarMAC attention +
GRUCell + dueling head, ``algos/madrqn/agents/gnn_agents.py:232-271`` +
``dueling.py:13-16``) lowers to a dozen XLA ops per scan iteration — into a
single Pallas call (forward) and a single Pallas call (backward, custom VJP),
so one scan step pays one launch/fusion boundary instead of ~12.

Design notes (TPU-first):

- Rows are (world, agent) pairs flattened to ``R = TB * A`` per grid tile, so
  every matmul runs at full 128-lane width (H=256, 3H=768 lane dims).
- The per-world A x A attention uses the BLOCK-DIAGONAL trick from
  ``pallas_kernels.py``: one ``[R, K] x [K, R]`` MXU matmul computes all
  source/dest signature-query dots; a world-block mask (iota compare) zeroes
  the cross-world 97%, which the MXU eats against the VPU's batched-reduce
  latency.  Same for the ``alpha^T @ v`` aggregation.
- No lane-splitting reshapes and no concatenates: concat([x, h]) @ W is
  computed as ``x @ W[:H] + h @ W[H:]`` (sublane slicing of the weight), and
  GRU gate splits are lane slices at multiples of H.
- Backward is full recompute (the step is tiny): re-derives gates/attention
  from the saved (x, h, adj) residuals, then accumulates weight gradients
  across sequential grid steps into constant-index output blocks (TPU grid
  iterations execute sequentially on one core).
- TarMAC's ``stop_gradient(h)`` into values/signatures/queries (reference
  ``gnn_agents.py:240-243``) is preserved: ``dh`` receives GRU-path
  cotangents only; the v/s/q weight grads still see h as an input.

Semantics contract: identical to ``models.comm.TarMAC.apply`` (n_rounds=1)
followed by ``models.heads.DuelingLayer`` / plain Linear — exactness-tested
against that XLA path in tests/test_step_kernel.py (interpret mode on CPU,
compiled on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30


def _world_block_mask(r, a):
    """[R, R] f32 mask: 1 where row & col belong to the same world."""
    row_w = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // a
    col_w = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // a
    return (row_w == col_w).astype(jnp.float32)


def _split2(w, h):
    """Row-split a stacked [H+D, O] weight into (w[:h], w[h:])."""
    return w[:h, :], w[h:, :]


def _attention_fwd(x, h, adjf, wv, bv, ws, bs, wq, bq, *, a, key_size):
    """Shared fwd recompute: returns (v2, s2, q2, mask_full, p, denom, alpha, c2).

    All f32.  x/h: [R, H]; adjf: [R, A] float 0/1 (edge src-row -> dst-agent).
    """
    r = x.shape[0]
    wv0, wv1 = _split2(wv, x.shape[1])
    ws0, ws1 = _split2(ws, x.shape[1])
    wq0, wq1 = _split2(wq, x.shape[1])

    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)
    v2 = dot(x, wv0, (((1,), (0,)), ((), ()))) \
        + dot(h, wv1, (((1,), (0,)), ((), ()))) + bv            # [R, M]
    s2 = dot(x, ws0, (((1,), (0,)), ((), ()))) \
        + dot(h, ws1, (((1,), (0,)), ((), ()))) + bs            # [R, K]
    q2 = dot(x, wq0, (((1,), (0,)), ((), ()))) \
        + dot(h, wq1, (((1,), (0,)), ((), ()))) + bq            # [R, K]

    # Block-diagonal scores: all (src-row, dst-row) dots in one MXU matmul,
    # masked down to same-world pairs with a valid src->dst(agent) edge.
    scores = dot(s2, q2, (((1,), (1,)), ((), ()))) / key_size   # [R, R]
    # Expand adjf [R, A] to [R, R] via a one-hot matmul (adj_full[s, d] =
    # adjf[s, d % A]) — avoids a TB-way lane concat, which Mosaic dislikes.
    expand = (jax.lax.broadcasted_iota(jnp.int32, (a, r), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (a, r), 1) % a
              ).astype(jnp.float32)                             # [A, R]
    adj_full = dot(adjf, expand, (((1,), (0,)), ((), ())))
    mask_full = _world_block_mask(r, a) * adj_full
    scores = jnp.where(mask_full > 0, scores, _NEG_BIG)

    # Masked softmax over SOURCES (axis 0) per destination column; zero
    # in-edge columns yield exactly 0 (matching ops.masked.masked_softmax).
    m = jnp.max(scores, axis=0, keepdims=True)                  # [1, R]
    shift = jnp.where(m <= _NEG_BIG / 2, 0.0, m)
    p = jnp.where(mask_full > 0, jnp.exp(scores - shift), 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
    alpha = p / denom                                           # [R(src), R(dst)]
    c2 = dot(alpha, v2, (((0,), (0,)), ((), ())))               # [R(dst), M]
    return v2, s2, q2, mask_full, alpha, c2


def _gru_fwd(x, c2, h, wi, wh, bi, bh, *, hidden):
    """Shared fwd recompute: returns (r_g, z_g, n_g, hn, h2), all f32."""
    wi0, wi1 = _split2(wi, hidden)
    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)
    gi = dot(x, wi0, (((1,), (0,)), ((), ()))) \
        + dot(c2, wi1, (((1,), (0,)), ((), ()))) + bi           # [R, 3H]
    gh = dot(h, wh, (((1,), (0,)), ((), ()))) + bh              # [R, 3H]
    i_r, i_z, i_n = (gi[:, :hidden], gi[:, hidden:2 * hidden],
                     gi[:, 2 * hidden:])
    h_r, h_z, hn = (gh[:, :hidden], gh[:, hidden:2 * hidden],
                    gh[:, 2 * hidden:])
    r_g = jax.nn.sigmoid(i_r + h_r)
    z_g = jax.nn.sigmoid(i_z + h_z)
    n_g = jnp.tanh(i_n + r_g * hn)
    h2 = (1.0 - z_g) * n_g + z_g * h
    return r_g, z_g, n_g, hn, h2


def _step_fwd_kernel(x_ref, h_ref, adj_ref, wv_ref, bv_ref, ws_ref, bs_ref,
                     wq_ref, bq_ref, wi_ref, wh_ref, bi_ref, bh_ref,
                     wo_ref, bo_ref, wvh_ref, bvh_ref,
                     q_ref, h2_ref, *, a, key_size, hidden, dueling):
    x = x_ref[:].astype(jnp.float32)
    h = h_ref[:].astype(jnp.float32)
    adjf = adj_ref[:].astype(jnp.float32)

    _, _, _, _, _, c2 = _attention_fwd(
        x, h, adjf, wv_ref[:].astype(jnp.float32), bv_ref[:].astype(jnp.float32),
        ws_ref[:].astype(jnp.float32), bs_ref[:].astype(jnp.float32),
        wq_ref[:].astype(jnp.float32), bq_ref[:].astype(jnp.float32),
        a=a, key_size=key_size)
    _, _, _, _, h2 = _gru_fwd(
        x, c2, h, wi_ref[:].astype(jnp.float32), wh_ref[:].astype(jnp.float32),
        bi_ref[:].astype(jnp.float32), bh_ref[:].astype(jnp.float32),
        hidden=hidden)

    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)
    adv = dot(h2, wo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ()))) \
        + bo_ref[:].astype(jnp.float32)
    if dueling:
        vh = dot(h2, wvh_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ()))) \
            + bvh_ref[:].astype(jnp.float32)
        q = vh + adv - jnp.mean(adv, axis=1, keepdims=True)
    else:
        q = adv
    q_ref[:] = q.astype(q_ref.dtype)
    h2_ref[:] = h2.astype(h2_ref.dtype)


def _step_bwd_kernel(x_ref, h_ref, adj_ref, wv_ref, bv_ref, ws_ref, bs_ref,
                     wq_ref, bq_ref, wi_ref, wh_ref, bi_ref, bh_ref,
                     wo_ref, bo_ref, wvh_ref, bvh_ref, gq_ref, gh2_ref,
                     dx_ref, dh_ref, dwv_ref, dbv_ref, dws_ref, dbs_ref,
                     dwq_ref, dbq_ref, dwi_ref, dwh_ref, dbi_ref, dbh_ref,
                     dwo_ref, dbo_ref, dwvh_ref, dbvh_ref,
                     *, a, key_size, hidden, dueling):
    """Recompute-style backward; weight grads accumulate across grid steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in (dwv_ref, dbv_ref, dws_ref, dbs_ref, dwq_ref, dbq_ref,
                    dwi_ref, dwh_ref, dbi_ref, dbh_ref, dwo_ref, dbo_ref,
                    dwvh_ref, dbvh_ref):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:].astype(jnp.float32)
    h = h_ref[:].astype(jnp.float32)
    adjf = adj_ref[:].astype(jnp.float32)
    wv = wv_ref[:].astype(jnp.float32)
    ws = ws_ref[:].astype(jnp.float32)
    wq = wq_ref[:].astype(jnp.float32)
    wi = wi_ref[:].astype(jnp.float32)
    wh = wh_ref[:].astype(jnp.float32)
    wo = wo_ref[:].astype(jnp.float32)
    gq = gq_ref[:].astype(jnp.float32)
    gh2 = gh2_ref[:].astype(jnp.float32)

    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)

    # ---- forward recompute ------------------------------------------------
    v2, s2, q2, mask_full, alpha, c2 = _attention_fwd(
        x, h, adjf, wv, bv_ref[:].astype(jnp.float32),
        ws, bs_ref[:].astype(jnp.float32), wq, bq_ref[:].astype(jnp.float32),
        a=a, key_size=key_size)
    r_g, z_g, n_g, hn, h2 = _gru_fwd(
        x, c2, h, wi, wh, bi_ref[:].astype(jnp.float32),
        bh_ref[:].astype(jnp.float32), hidden=hidden)

    # ---- head backward ----------------------------------------------------
    if dueling:
        wvh = wvh_ref[:].astype(jnp.float32)
        # q = vh + adv - mean(adv); dvh = rowsum(gq), dadv = gq - mean(gq).
        dvh = jnp.sum(gq, axis=1, keepdims=True)                 # [R, 1]
        dadv = gq - jnp.mean(gq, axis=1, keepdims=True)
        dh2 = dot(dadv, wo, (((1,), (1,)), ((), ()))) \
            + dot(dvh, wvh, (((1,), (1,)), ((), ())))
        dwvh_ref[:] += dot(h2, dvh, (((0,), (0,)), ((), ())))
        dbvh_ref[:] += jnp.sum(dvh, axis=0, keepdims=True)
    else:
        dadv = gq
        dh2 = dot(dadv, wo, (((1,), (1,)), ((), ())))
    dwo_ref[:] += dot(h2, dadv, (((0,), (0,)), ((), ())))
    dbo_ref[:] += jnp.sum(dadv, axis=0, keepdims=True)
    dh2 = dh2 + gh2

    # ---- GRU backward -----------------------------------------------------
    dn = dh2 * (1.0 - z_g)
    dz = dh2 * (h - n_g)
    dh = dh2 * z_g
    dpre_n = dn * (1.0 - n_g * n_g)
    dr = dpre_n * hn
    dhn = dpre_n * r_g
    dpre_z = dz * z_g * (1.0 - z_g)
    dpre_r = dr * r_g * (1.0 - r_g)

    wi0, wi1 = _split2(wi, hidden)
    sl_r, sl_z, sl_n = (slice(0, hidden), slice(hidden, 2 * hidden),
                        slice(2 * hidden, 3 * hidden))
    # du = dgi @ wi^T, split into the x part and the c part without concats.
    dx = dot(dpre_r, wi0[:, sl_r], (((1,), (1,)), ((), ()))) \
        + dot(dpre_z, wi0[:, sl_z], (((1,), (1,)), ((), ()))) \
        + dot(dpre_n, wi0[:, sl_n], (((1,), (1,)), ((), ())))
    dc = dot(dpre_r, wi1[:, sl_r], (((1,), (1,)), ((), ()))) \
        + dot(dpre_z, wi1[:, sl_z], (((1,), (1,)), ((), ()))) \
        + dot(dpre_n, wi1[:, sl_n], (((1,), (1,)), ((), ())))
    # dgh = [dpre_r | dpre_z | dhn]; dh += dgh @ wh^T.
    dh = dh + dot(dpre_r, wh[:, sl_r], (((1,), (1,)), ((), ()))) \
        + dot(dpre_z, wh[:, sl_z], (((1,), (1,)), ((), ()))) \
        + dot(dhn, wh[:, sl_n], (((1,), (1,)), ((), ())))

    for sl, gx, gh_ in ((sl_r, dpre_r, dpre_r), (sl_z, dpre_z, dpre_z),
                        (sl_n, dpre_n, dhn)):
        dwi_ref[:hidden, sl] += dot(x, gx, (((0,), (0,)), ((), ())))
        dwi_ref[hidden:, sl] += dot(c2, gx, (((0,), (0,)), ((), ())))
        dwh_ref[:, sl] += dot(h, gh_, (((0,), (0,)), ((), ())))
        dbi_ref[:, sl] += jnp.sum(gx, axis=0, keepdims=True)
        dbh_ref[:, sl] += jnp.sum(gh_, axis=0, keepdims=True)

    # ---- attention backward ----------------------------------------------
    # c2[d] = sum_s alpha[s, d] v2[s]
    dalpha = dot(v2, dc, (((1,), (1,)), ((), ())))               # [R(s), R(d)]
    dv2 = dot(alpha, dc, (((1,), (0,)), ((), ())))               # [R(s), M]
    colsum = jnp.sum(alpha * dalpha, axis=0, keepdims=True)      # [1, R]
    dscore = alpha * (dalpha - colsum)                           # masked rows: 0
    ds2 = dot(dscore, q2, (((1,), (0,)), ((), ()))) / key_size
    dq2 = dot(dscore, s2, (((0,), (0,)), ((), ()))) / key_size

    # ---- v/s/q linears (h is stop_gradient'ed into these) ------------------
    hdim = hidden
    wv0, _ = _split2(wv, hdim)
    ws0, _ = _split2(ws, hdim)
    wq0, _ = _split2(wq, hdim)
    dx = dx + dot(dv2, wv0, (((1,), (1,)), ((), ()))) \
        + dot(ds2, ws0, (((1,), (1,)), ((), ()))) \
        + dot(dq2, wq0, (((1,), (1,)), ((), ())))
    for dref, bref, gout in ((dwv_ref, dbv_ref, dv2), (dws_ref, dbs_ref, ds2),
                             (dwq_ref, dbq_ref, dq2)):
        dref[:hdim, :] += dot(x, gout, (((0,), (0,)), ((), ())))
        dref[hdim:, :] += dot(h, gout, (((0,), (0,)), ((), ())))
        bref[:] += jnp.sum(gout, axis=0, keepdims=True)

    dx_ref[:] = dx.astype(dx_ref.dtype)
    dh_ref[:] = dh.astype(dh_ref.dtype)


def _pick_tile_worlds(a, n_worlds):
    """Rows per tile ~256, tile holds whole worlds, rows % 8 == 0 (f32 tiling).

    May exceed ``n_worlds`` — the world axis is padded up with fully-masked
    worlds (zero adj -> zero attention output) in :func:`_prep`.
    """
    tb = max(1, 256 // a)
    while (tb * a) % 8 != 0:
        tb += 1
    return tb


def _prep(x, h, adjf, tile_worlds, a):
    """Pad the world axis so R_total divides the tile row count."""
    n_worlds = x.shape[0] // a
    pad_w = (-n_worlds) % tile_worlds
    if pad_w:
        pad_r = pad_w * a
        x = jnp.pad(x, ((0, pad_r), (0, 0)))
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
        adjf = jnp.pad(adjf, ((0, pad_r), (0, 0)))
    return x, h, adjf, n_worlds + pad_w


def _weight_specs(hidden, msg, key_size, n_act):
    """(BlockSpec, shape) pairs for the 14 weight operands, in call order."""
    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM), shape
    return [
        const((2 * hidden, msg)), const((1, msg)),          # wv, bv
        const((2 * hidden, key_size)), const((1, key_size)),  # ws, bs
        const((2 * hidden, key_size)), const((1, key_size)),  # wq, bq
        const((hidden + msg, 3 * hidden)), const((hidden, 3 * hidden)),  # wi, wh
        const((1, 3 * hidden)), const((1, 3 * hidden)),     # bi, bh
        const((hidden, n_act)), const((1, n_act)),          # wo, bo
        const((hidden, 1)), const((1, 1)),                  # wvh, bvh
    ]


@functools.partial(jax.jit, static_argnames=("a", "key_size", "dueling",
                                             "tile_worlds", "interpret"))
def tarmac_step(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh, wo, bo,
                wvh, bvh, a, key_size, dueling, tile_worlds=None,
                interpret=None):
    """Fused TarMAC + GRU + head step (forward only; see tarmac_step_train).

    x/h: [W*A, H] rows world-major; adjf: [W*A, A] float edge mask
    (adjf[w*A+i, j] = edge i->j in world w; self-loops included upstream).
    Returns (q [W*A, n_act], h2 [W*A, H]) in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hidden = h.shape[1]
    msg = wv.shape[1]
    n_act = wo.shape[1]
    if tile_worlds is None:
        tile_worlds = _pick_tile_worlds(a, x.shape[0] // a)
    n0 = x.shape[0]
    x, h, adjf, n_worlds = _prep(x, h, adjf, tile_worlds, a)
    r_tile = tile_worlds * a
    grid = (x.shape[0] // r_tile,)

    row = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    wspecs = _weight_specs(hidden, msg, key_size, n_act)
    q, h2 = pl.pallas_call(
        functools.partial(_step_fwd_kernel, a=a, key_size=key_size,
                          hidden=hidden, dueling=dueling),
        grid=grid,
        in_specs=[row((r_tile, hidden)), row((r_tile, hidden)),
                  row((r_tile, a))] + [s for s, _ in wspecs],
        out_specs=[row((r_tile, n_act)), row((r_tile, hidden))],
        out_shape=[jax.ShapeDtypeStruct((x.shape[0], n_act), x.dtype),
                   jax.ShapeDtypeStruct((x.shape[0], hidden), x.dtype)],
        interpret=interpret,
    )(x, h, adjf, wv, bv.reshape(1, -1), ws, bs.reshape(1, -1), wq,
      bq.reshape(1, -1), wi, wh, bi.reshape(1, -1), bh.reshape(1, -1),
      wo, bo.reshape(1, -1), wvh, bvh.reshape(1, -1))
    return q[:n0], h2[:n0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21))
def tarmac_step_train(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh,
                      wo, bo, wvh, bvh, a, key_size, dueling,
                      tile_worlds=None, interpret=None):
    """Differentiable fused recurrent step (Pallas forward AND backward).

    Same contract as :func:`tarmac_step`; ``adjf`` is non-differentiated
    (zero cotangent).  Training use-site: ``models.agents.GnnAgent.step``
    with ``step_backend='pallas'`` — the scan-BPTT update then runs ONE
    Pallas call per scan step forward and one backward.
    """
    return tarmac_step(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh,
                       wo, bo, wvh, bvh, a, key_size, dueling,
                       tile_worlds=tile_worlds, interpret=interpret)


def _tst_fwd(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh, wo, bo,
             wvh, bvh, a, key_size, dueling, tile_worlds, interpret):
    out = tarmac_step(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh,
                      wo, bo, wvh, bvh, a, key_size, dueling,
                      tile_worlds=tile_worlds, interpret=interpret)
    return out, (x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh, wo, bo,
                 wvh, bvh)


def _tst_bwd(a, key_size, dueling, tile_worlds, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh, wo, bo,
     wvh, bvh) = res
    gq, gh2 = g
    hidden = h.shape[1]
    msg = wv.shape[1]
    n_act = wo.shape[1]
    if tile_worlds is None:
        tile_worlds = _pick_tile_worlds(a, x.shape[0] // a)
    n0 = x.shape[0]
    x_p, h_p, adjf_p, _ = _prep(x, h, adjf, tile_worlds, a)
    pad_r = x_p.shape[0] - n0
    if pad_r:
        gq = jnp.pad(gq, ((0, pad_r), (0, 0)))
        gh2 = jnp.pad(gh2, ((0, pad_r), (0, 0)))
    r_tile = tile_worlds * a
    grid = (x_p.shape[0] // r_tile,)

    row = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    wspecs = _weight_specs(hidden, msg, key_size, n_act)
    wspec_blocks = [s for s, _ in wspecs]
    wshapes = [shape for _, shape in wspecs]

    outs = pl.pallas_call(
        functools.partial(_step_bwd_kernel, a=a, key_size=key_size,
                          hidden=hidden, dueling=dueling),
        grid=grid,
        in_specs=[row((r_tile, hidden)), row((r_tile, hidden)),
                  row((r_tile, a))] + wspec_blocks
                 + [row((r_tile, n_act)), row((r_tile, hidden))],
        out_specs=[row((r_tile, hidden)), row((r_tile, hidden))]
                  + wspec_blocks,
        out_shape=[jax.ShapeDtypeStruct((x_p.shape[0], hidden), x.dtype),
                   jax.ShapeDtypeStruct((x_p.shape[0], hidden), h.dtype)]
                  + [jax.ShapeDtypeStruct(shape, jnp.float32)
                     for shape in wshapes],
        interpret=interpret,
    )(x_p, h_p, adjf_p, wv, bv.reshape(1, -1), ws, bs.reshape(1, -1), wq,
      bq.reshape(1, -1), wi, wh, bi.reshape(1, -1), bh.reshape(1, -1),
      wo, bo.reshape(1, -1), wvh, bvh.reshape(1, -1), gq, gh2)

    (dx, dh, dwv, dbv, dws, dbs, dwq, dbq, dwi, dwh, dbi, dbh, dwo, dbo,
     dwvh, dbvh) = outs
    if not dueling:
        dwvh = jnp.zeros_like(dwvh)
        dbvh = jnp.zeros_like(dbvh)
    return (dx[:n0], dh[:n0], jnp.zeros_like(adjf),
            dwv.astype(wv.dtype), dbv[0].astype(bv.dtype),
            dws.astype(ws.dtype), dbs[0].astype(bs.dtype),
            dwq.astype(wq.dtype), dbq[0].astype(bq.dtype),
            dwi.astype(wi.dtype), dwh.astype(wh.dtype),
            dbi[0].astype(bi.dtype), dbh[0].astype(bh.dtype),
            dwo.astype(wo.dtype), dbo[0].astype(bo.dtype),
            dwvh.astype(wvh.dtype), dbvh[0].astype(bvh.dtype))


tarmac_step_train.defvjp(_tst_fwd, _tst_bwd)


def tarmac_step_reference(x, h, adjf, wv, bv, ws, bs, wq, bq, wi, wh, bi, bh,
                          wo, bo, wvh, bvh, a, key_size, dueling):
    """Dense XLA twin (same flattened contract) for exactness tests."""
    from uav_bs_ctrl_tpu.models.modules import gru
    from uav_bs_ctrl_tpu.ops.masked import masked_softmax
    w = x.shape[0] // a
    x3 = x.reshape(w, a, -1)
    h3 = h.reshape(w, a, -1)
    adj = adjf.reshape(w, a, a) > 0
    inputs = jnp.concatenate([x3, jax.lax.stop_gradient(h3)], axis=-1)
    v = inputs @ wv + bv
    s = inputs @ ws + bs
    q = inputs @ wq + bq
    scores = jnp.einsum("wsk,wdk->wsd", s, q) / key_size
    alpha = masked_softmax(scores, adj, axis=-2)
    c = jnp.einsum("wsd,wsm->wdm", alpha, v)
    h2 = gru({"wi": wi, "wh": wh, "bi": bi, "bh": bh},
             jnp.concatenate([x3, c], axis=-1), h3)
    adv = h2 @ wo + bo
    if dueling:
        qv = (h2 @ wvh + bvh) + adv - jnp.mean(adv, axis=-1, keepdims=True)
    else:
        qv = adv
    return qv.reshape(w * a, -1), h2.reshape(w * a, -1)
