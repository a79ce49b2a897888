"""Graph parallelism: relation edge-partitioning over a mesh axis.

The BASELINE north star calls for edge-partitioned heterograph aggregation
with cross-device exchange over ICI.  In the dense-masked layout, an edge
partition of the 'seen' relation IS a shard of the GT-slot axis: each device
holds M/gp candidate slots per destination and computes a partial masked
softmax; two tiny ``psum``s (running max is folded into exp-sum with the
standard log-sum-exp correction) produce the exact global softmax, and a
third ``psum`` combines the partial weighted aggregates.  Per-destination
traffic is O(H) scalars + O(H*F) output — independent of the number of GT
slots — so the exchange rides ICI while each shard's gather/score work stays
local.

``gatv2_graph_parallel`` is numerically identical to ``models.encoders.gatv2``
(dense backend) and is validated against it on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from uav_bs_ctrl_tpu.models.modules import linear

_NEG_BIG = -1e30

# Training-step wiring: ``models.encoders.gatv2(backend='graph_parallel')``
# fetches the registered (mesh, axis) here at trace time, so a learner can be
# switched onto the edge-partitioned path by a config flag + one registration
# call (see ``distribute_learner(..., graph_parallel=True)``).
_GP_MESH = None
_GP_AXIS = "gp"


def set_graph_parallel_mesh(mesh, axis="gp"):
    """Register the mesh/axis used by ``gat_backend='graph_parallel'``."""
    global _GP_MESH, _GP_AXIS
    _GP_MESH = mesh
    _GP_AXIS = axis


def get_graph_parallel_mesh():
    return _GP_MESH, _GP_AXIS


def pad_slot_axis(x_src, mask, axis_size):
    """Pad the slot axis (``x_src[..., M, d]`` / ``mask[..., M]``) to a
    multiple of ``axis_size`` with masked (all-invalid) slots.

    Exact by construction: padded slots carry ``mask=False`` and the masked
    softmax/mean/max reductions give them zero weight, so the aggregate is
    bitwise the unpadded result.  This is what lets the edge-partitioned path
    cover relations whose slot count does not divide the mesh axis (e.g. the
    'near' relation's ``n_ubs - 1`` slots).
    """
    m = x_src.shape[-2]
    pad = (-m) % axis_size
    if pad == 0:
        return x_src, mask
    x_src = jnp.pad(x_src, [(0, 0)] * (x_src.ndim - 2) + [(0, pad), (0, 0)])
    mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)],
                   constant_values=False)
    return x_src, mask


def gatv2_graph_parallel(p, x_src, x_dst, mask, n_heads, mesh: Mesh, axis="gp",
                         negative_slope=0.2, activation=jax.nn.relu):
    """Masked bipartite GATv2 with the source-slot axis sharded over ``axis``.

    x_src: [..., M, d_src] (M sharded over ``axis``), x_dst: [..., d_dst],
    mask: [..., M] -> out [..., H*F].  Leading batch dims are flattened for
    the shard_map region and restored after.  Differentiable: the max-shift
    is stop_gradient'ed (exact — the shift cancels in the softmax), so the
    backward needs only the transposes of the two psums (all-gathers).
    """
    feats = p["fc_src"]["w"].shape[1] // n_heads
    hf = n_heads * feats

    def local_block(el_blk, er, mask_blk):
        # el_blk: [N, M_loc, H*F]; er: [N, H*F]; mask_blk: [N, M_loc]
        n, m_loc, _ = el_blk.shape
        el_h = el_blk.reshape(n, m_loc, n_heads, feats)
        er_h = er.reshape(n, 1, n_heads, feats)
        e = jax.nn.leaky_relu(el_h + er_h, negative_slope)
        scores = jnp.sum(e * p["attn"], axis=-1)                  # [N, M_loc, H]
        scores = jnp.where(mask_blk[..., None], scores, _NEG_BIG)

        local_max = jnp.max(scores, axis=1)                       # [N, H]
        # pmax has no AD rule; all_gather+max is differentiable (and the
        # shift is stop_gradient'ed anyway — it cancels exactly in softmax).
        global_max = jnp.max(jax.lax.all_gather(
            jax.lax.stop_gradient(local_max), axis), axis=0)
        shift = jnp.where(global_max <= _NEG_BIG / 2, 0.0, global_max)

        w = jnp.where(mask_blk[..., None], jnp.exp(scores - shift[:, None, :]), 0.0)
        denom = jax.lax.psum(jnp.sum(w, axis=1), axis)            # [N, H]
        acc = jax.lax.psum(jnp.einsum("nmh,nmhf->nhf", w, el_h), axis)
        out = acc / jnp.maximum(denom, 1e-30)[..., None]
        return out.reshape(n, hf)

    el = linear(p["fc_src"], x_src)                               # [..., M, H*F]
    er = linear(p["fc_dst"], x_dst)                               # [..., H*F]

    batch_shape = x_src.shape[:-2]
    m = x_src.shape[-2]
    el2 = el.reshape((-1, m, hf))
    er2 = er.reshape((-1, hf))
    mask2 = jnp.broadcast_to(mask, batch_shape + (m,)).reshape((-1, m))

    ft = shard_map(
        local_block, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None), P(None, axis)),
        out_specs=P(None, None),
    )(el2, er2, mask2)
    ft = ft.reshape(batch_shape + (hf,))

    rst = ft + (linear(p["res_fc"], x_dst) if "res_fc" in p else x_dst)
    return activation(rst) if activation is not None else rst


def tarmac_attention_graph_parallel(s, q, v, adj, key_size, mesh: Mesh, axis="gp"):
    """TarMAC talk-graph attention with the SOURCE-agent axis sharded.

    The comm talk graph has A^2 edges — the relation that grows quadratically
    with swarm size — so its edge partition is a shard of the source-agent
    axis: each device holds S/gp source agents' signatures/values, computes
    partial masked scores against the (replicated) queries, and the exact
    global per-destination softmax is assembled with the same two-psum
    log-sum-exp trick as :func:`gatv2_graph_parallel` (``:62-82`` pattern):
    an all-gathered running max, a psum'd denominator, and a psum of the
    partial attention-weighted value sums.  Per-destination traffic is O(1)
    scalars + O(msg) output, independent of the source count.

    s: [..., S, K] signatures, q: [..., D, K] queries, v: [..., S, M] values,
    adj: [..., S, D] edge mask (src->dst) -> c: [..., D, M].  Numerically
    identical to the dense path ``masked_softmax(s@q.T/key_size, adj, -2) @ v``
    (reference TarMAC, ``gnn_agents.py:232-271``); non-divisible S is padded
    with masked sources (exact).  Differentiable: the max-shift is
    stop_gradient'ed, so the backward is the psum/all-gather transposes.
    """
    g = mesh.shape[axis]
    S = s.shape[-2]
    pad = (-S) % g
    if pad:
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad), (0, 0)])
        adj = jnp.pad(adj, [(0, 0)] * (adj.ndim - 2) + [(0, pad), (0, 0)],
                      constant_values=False)

    sp, dk, dm = s.shape[-2], q.shape[-1], v.shape[-1]
    d = q.shape[-2]
    batch_shape = s.shape[:-2]
    s2 = s.reshape((-1, sp, dk))
    q2 = q.reshape((-1, d, dk))
    v2 = v.reshape((-1, sp, dm))
    adj2 = jnp.broadcast_to(adj, batch_shape + (sp, d)).reshape((-1, sp, d))

    def local_block(s_blk, q_full, v_blk, adj_blk):
        # s_blk/v_blk: [N, S_loc, *]; q_full: [N, D, K]; adj_blk: [N, S_loc, D]
        scores = jnp.einsum("nsk,ndk->nsd", s_blk, q_full) / key_size
        scores = jnp.where(adj_blk, scores, _NEG_BIG)
        local_max = jnp.max(scores, axis=1)                        # [N, D]
        global_max = jnp.max(jax.lax.all_gather(
            jax.lax.stop_gradient(local_max), axis), axis=0)
        shift = jnp.where(global_max <= _NEG_BIG / 2, 0.0, global_max)
        w = jnp.where(adj_blk, jnp.exp(scores - shift[:, None, :]), 0.0)
        denom = jax.lax.psum(jnp.sum(w, axis=1), axis)             # [N, D]
        acc = jax.lax.psum(jnp.einsum("nsd,nsm->ndm", w, v_blk), axis)
        return acc / jnp.maximum(denom, 1e-30)[..., None]

    c = shard_map(
        local_block, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, None),
                  P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, None, None),
    )(s2, q2, v2, adj2)
    return c.reshape(batch_shape + (d, dm))
