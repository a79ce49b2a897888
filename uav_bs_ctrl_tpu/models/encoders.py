"""Observation encoders: dense MLP and heterograph GATv2 attention.

Activation-parity surface:

- ``DenseObservationEncoder`` — reference ``algos/madrqn/agents/gnn_agents.py:62-77``:
  n_layers x (Linear -> ReLU) on the agent's flat features.
- ``gatv2`` — DGL 0.9 ``GATv2Conv`` bipartite semantics (reference use-sites
  ``gnn_agents.py:93-97``, ``algos/drqn/agents/gnn_agents.py:17-18``):
  ``e_ij = a . LeakyReLU(W_src x_j + W_dst x_i)``; attention is a softmax over
  each destination's valid in-edges; the message is the transformed *source*
  feature ``W_src x_j``; residual projection of destination features; ReLU.
  Zero valid in-edges -> output is residual(+activation) only.
- ``GraphObservationEncoder`` — reference ``gnn_agents.py:80-107``: per-relation
  GATv2 over 'seen' (gt->agent) and 'near' (ubs->agent), concat, Linear+ReLU.

TPU-first layout: instead of DGL's dynamic node sets, each agent owns a
fixed-size neighborhood slot array (``[..., A, M, d]`` candidate features +
``[..., A, M]`` visibility mask — exactly the env's obs layout), so attention
is a batched masked softmax + matmul on the MXU and shapes never change.
"""

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.models.modules import linear, linear_init, mlp, mlp_init, xavier_normal_init
from uav_bs_ctrl_tpu.ops.masked import masked_softmax

_SQRT2 = 1.4142135623730951

_gp_fallback_warned = set()


def _warn_graph_parallel_fallback(n_slots):
    """One-time warning when gat_backend='graph_parallel' routes to dense.

    Losing the distributed path silently is invisible in run logs otherwise;
    warn once per slot count.  Since round 4 the only fallback cause is "no
    mesh registered" — non-divisible slot counts are PADDED to the axis size
    (masked pad slots contribute exactly nothing), so the distributed path
    covers every relation including the tiny 'near' one.  This runs at TRACE
    time (the fallback is a static decision), so the warning fires once per
    compilation, not per step.
    """
    if n_slots in _gp_fallback_warned:
        return
    _gp_fallback_warned.add(n_slots)
    import warnings
    warnings.warn(
        f"backend='graph_parallel' ({n_slots}) fell back to dense: no mesh "
        "registered (parallel.graph_parallel.set_graph_parallel_mesh)",
        RuntimeWarning, stacklevel=3)


def gatv2_init(key, d_src, d_dst, n_heads, feats_per_head, dtype=jnp.float32):
    """DGL-0.9-compatible init: xavier_normal(gain=sqrt(2)) weights."""
    out = n_heads * feats_per_head
    k_src, k_dst, k_attn, k_res = jax.random.split(key, 4)
    params = {
        "fc_src": xavier_normal_init(k_src, d_src, out, gain=_SQRT2, dtype=dtype),
        "fc_dst": xavier_normal_init(k_dst, d_dst, out, gain=_SQRT2, dtype=dtype),
        # torch xavier_normal on a (1, H, F) tensor: fan_in=H*F, fan_out=F.
        "attn": _SQRT2 * jnp.sqrt(2.0 / (n_heads * feats_per_head + feats_per_head))
                * jax.random.normal(k_attn, (n_heads, feats_per_head), dtype),
    }
    if d_dst != out:
        params["res_fc"] = xavier_normal_init(k_res, d_dst, out, gain=_SQRT2, dtype=dtype)
    return params


def gatv2(p, x_src, x_dst, mask, n_heads, negative_slope=0.2, activation=jax.nn.relu,
          backend="dense", need_dx=True):
    """Masked bipartite GATv2 with residual.

    x_src: [..., M, d_src] candidate source features per destination,
    x_dst: [..., d_dst], mask: [..., M] validity -> out [..., H*F].

    backend: 'dense' (XLA masked softmax, default) or 'pallas' (fused
    flash-style kernel from ``ops.pallas_kernels`` — preferable at swarm
    scale where the materialized [.., M, H] score tensors dominate HBM
    traffic).
    """
    feats = p["fc_src"]["w"].shape[1] // n_heads
    if x_src.shape[-2] == 0:
        # Statically empty neighborhood (e.g. single-UBS maps have no 'near'
        # slots): zero in-degree everywhere -> residual(+activation) only.
        rst = linear(p["res_fc"], x_dst) if "res_fc" in p else x_dst
        return activation(rst) if activation is not None else rst
    er = linear(p["fc_dst"], x_dst)                       # [..., H*F]

    if backend == "pallas":
        el = linear(p["fc_src"], x_src)                   # [..., M, H*F]
        from uav_bs_ctrl_tpu.ops.pallas_kernels import flash_gat
        batch_shape = el.shape[:-2]
        m = el.shape[-2]
        hf = el.shape[-1]
        el2 = el.reshape((-1, m, hf))
        er2 = er.reshape((-1, hf))
        mask2 = jnp.broadcast_to(mask, batch_shape + (m,)).reshape((-1, m))
        ft_flat = flash_gat(el2, er2, p["attn"], mask2, n_heads,
                            negative_slope=negative_slope)
        rst = ft_flat.reshape(batch_shape + (hf,))
    elif backend == "graph_parallel":
        # Edge-partitioned aggregation: the source-slot (GT-slot) axis is
        # sharded over the registered mesh axis; per-destination exchange is
        # two O(H)-scalar psums + one O(H*F) psum (see parallel/graph_parallel).
        # Slot counts that do not divide the axis are padded with masked slots
        # (exact: masked slots contribute nothing to the softmax), so the
        # distributed path covers every relation — including the tiny 'near'
        # one.  Falls back to dense only when no mesh is registered.
        from uav_bs_ctrl_tpu.parallel.graph_parallel import (
            get_graph_parallel_mesh, gatv2_graph_parallel, pad_slot_axis)
        mesh, axis = get_graph_parallel_mesh()
        if mesh is not None:
            x_src, mask = pad_slot_axis(x_src, mask, mesh.shape[axis])
            return gatv2_graph_parallel(p, x_src, x_dst, mask, n_heads, mesh,
                                        axis=axis, negative_slope=negative_slope,
                                        activation=activation)
        _warn_graph_parallel_fallback(x_src.shape[-2])
        return gatv2(p, x_src, x_dst, mask, n_heads, negative_slope,
                     activation, backend="dense")
    elif backend in ("pallas_fused", "pallas_fused_mxu"):
        # Projection fused into the kernel: el ([.., M, H*F]) never hits HBM;
        # per-edge HBM reads shrink from H*F to d_src floats.  Differentiable
        # (custom VJP with a flash-style recompute backward) — usable inside
        # the jitted training update, not just acting.  The '_mxu' variant
        # routes the score/aggregation contractions through MXU dot_generals
        # (hardware A/B: 15.06 ms vs XLA dense 19.86 ms at 4096x800x(4x64)).
        from uav_bs_ctrl_tpu.ops.pallas_kernels import GAT_TILE_N, flash_gat_fused_train
        mxu = backend.endswith("_mxu")
        batch_shape = x_src.shape[:-2]
        m = x_src.shape[-2]
        d_src = x_src.shape[-1]
        hf = er.shape[-1]
        x2 = x_src.reshape((-1, m, d_src))
        er2 = er.reshape((-1, hf))
        mask2 = jnp.broadcast_to(mask, batch_shape + (m,)).reshape((-1, m))
        ft_flat = flash_gat_fused_train(x2, p["fc_src"]["w"], p["fc_src"]["b"],
                                        er2, p["attn"],
                                        mask2.astype(x_src.dtype), n_heads,
                                        negative_slope,
                                        tile_n=GAT_TILE_N[backend], mxu=mxu,
                                        need_dx=need_dx)
        rst = ft_flat.reshape(batch_shape + (hf,))
    else:
        el = linear(p["fc_src"], x_src)                   # [..., M, H*F]
        el_h = el.reshape(el.shape[:-1] + (n_heads, feats))
        er_h = er[..., None, :].reshape(er.shape[:-1] + (1, n_heads, feats))
        e = jax.nn.leaky_relu(el_h + er_h, negative_slope)     # [..., M, H, F]
        scores = jnp.sum(e * p["attn"], axis=-1)               # [..., M, H]
        alpha = masked_softmax(scores, mask[..., None], axis=-2)
        ft = jnp.sum(alpha[..., None] * el_h, axis=-3)         # [..., H, F]
        rst = ft.reshape(ft.shape[:-2] + (n_heads * feats,))

    if "res_fc" in p:
        rst = rst + linear(p["res_fc"], x_dst)
    else:
        rst = rst + x_dst
    return activation(rst) if activation is not None else rst


class DenseObservationEncoder:
    """MLP on the agent's flat features (reference D1)."""

    def __init__(self, obs_shape: int, args):
        self.obs_shape = obs_shape
        self.hidden = args.hidden_size
        self.n_layers = args.n_layers

    def init(self, key):
        return mlp_init(key, self.obs_shape, self.hidden, self.n_layers)

    def apply(self, p, obs):
        return mlp(p, obs["agent"])


class GraphObservationEncoder:
    """Per-relation GATv2 ('seen': gt->agent, 'near': ubs->agent) + aggregator.

    obs dict layout (the env's padded neighborhoods; column 0 of gt/ubs rows
    is the visibility flag used as the edge mask, columns 1: are features —
    matching the reference graph builder ``env_wrappers.py:69-89`` which
    attaches ``obs[...][ids, 1:]`` as node features):

    - obs['agent']: [..., A, d_agent]
    - obs['gt']:    [..., A, M, 1 + d_gt]
    - obs['ubs']:   [..., A, K, 1 + d_ubs]
    """

    def __init__(self, obs_shape: dict, args):
        self.d_agent = obs_shape["agent"]
        self.d_gt = obs_shape["gt"]
        self.d_ubs = obs_shape["ubs"]
        self.hidden = args.hidden_size
        self.n_heads = args.n_heads
        self.backend = getattr(args, "gat_backend", "dense")
        assert self.hidden % self.n_heads == 0
        self.feats_per_head = self.hidden // self.n_heads

    def init(self, key):
        k_seen, k_near, k_aggr = jax.random.split(key, 3)
        return {
            "seen": gatv2_init(k_seen, self.d_gt, self.d_agent, self.n_heads, self.feats_per_head),
            "near": gatv2_init(k_near, self.d_ubs, self.d_agent, self.n_heads, self.feats_per_head),
            "aggr": linear_init(k_aggr, 2 * self.hidden, self.hidden),
        }

    def apply(self, p, obs):
        gt_mask = obs["gt"][..., 0] > 0
        ubs_mask = obs["ubs"][..., 0] > 0
        # need_dx=False: the source features here are observation leaves —
        # nothing ever differentiates w.r.t. them, so the Pallas backward
        # skips the [.., M, d] obs-cotangent matmul and HBM write.
        # UAVBS_GAT_FORCE_DX=1 restores it (hardware A/B lever, RESULTS.md).
        import os as _os
        need_dx = bool(_os.environ.get("UAVBS_GAT_FORCE_DX"))
        x_gt = gatv2(p["seen"], obs["gt"][..., 1:], obs["agent"], gt_mask,
                     self.n_heads, backend=self.backend, need_dx=need_dx)
        x_ubs = gatv2(p["near"], obs["ubs"][..., 1:], obs["agent"], ubs_mask,
                      self.n_heads, backend=self.backend, need_dx=need_dx)
        x = jnp.concatenate([x_gt, x_ubs], axis=-1)
        return jax.nn.relu(linear(p["aggr"], x))
