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
from jax.experimental.shard_map import shard_map

from uav_bs_ctrl_tpu.models.modules import linear

_NEG_BIG = -1e30


def gatv2_graph_parallel(p, x_src, x_dst, mask, n_heads, mesh: Mesh, axis="gp",
                         negative_slope=0.2, activation=jax.nn.relu):
    """Masked bipartite GATv2 with the source-slot axis sharded over ``axis``.

    x_src: [N, M, d_src] (M sharded over ``axis``), x_dst: [N, d_dst],
    mask: [N, M] -> out [N, H*F].
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
        global_max = jax.lax.pmax(local_max, axis)
        shift = jnp.where(global_max <= _NEG_BIG / 2, 0.0, global_max)

        w = jnp.where(mask_blk[..., None], jnp.exp(scores - shift[:, None, :]), 0.0)
        denom = jax.lax.psum(jnp.sum(w, axis=1), axis)            # [N, H]
        acc = jax.lax.psum(jnp.einsum("nmh,nmhf->nhf", w, el_h), axis)
        out = acc / jnp.maximum(denom, 1e-30)[..., None]
        return out.reshape(n, hf)

    el = linear(p["fc_src"], x_src)                               # [N, M, H*F]
    er = linear(p["fc_dst"], x_dst)                               # [N, H*F]

    ft = shard_map(
        local_block, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None), P(None, axis)),
        out_specs=P(None, None),
    )(el, er, mask)

    rst = ft + (linear(p["res_fc"], x_dst) if "res_fc" in p else x_dst)
    return activation(rst) if activation is not None else rst
