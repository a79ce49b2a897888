"""Graph-structured multi-agent communication protocols.

Activation-parity surface (reference ``algos/madrqn/agents/gnn_agents.py``):

- ``BaseComm``     (ref ``:113-148``): per-edge message Linear([x_src; sg(h_src)]),
  mean aggregation, GRU([x; c], h).
- ``DiscreteComm`` (ref ``:151-193``): 2-way Gumbel-softmax bits per edge,
  elementwise-max (OR) aggregation, decode Linear, GRU([x; dec(c)], h).
- ``CommNet``      (ref ``:196-229``): message = sg(h_src), mean aggregation,
  GRU(x + Linear(c), h), multi-round.
- ``TarMAC``       (ref ``:232-271``): signature/query dot scores / key_size,
  per-destination softmax, attention-weighted value sum, GRU([x; c], h),
  multi-round.
- ``EdgeConv``     (ref ``:274-300``): per-edge Linear([x_s; sg(h_s); x_d; sg(h_d)]),
  mean aggregation, GRU([x; c], h), multi-round.

TPU-first layout: the talk graph is a dense adjacency mask ``adj[..., S, D]``
(edge src->dst iff True; self-loops present by construction, reference quirk
``env_wrappers.py:141-144``).  Mean/max/softmax aggregations are batched
masked matmuls/reductions on the MXU; "no edges" degenerates to the
reference's explicit zero-padding (masked reductions yield 0).

Documented reference quirk (SURVEY.md §2.4 #7): the reference zero-pads ``c``
with ``hidden_size`` columns in BaseComm even though the GRU expects
``msg_size`` — a latent crash when msg_size != hidden_size and no edges exist.
We pad with the *correct* width (msg_size); reachable configs are unaffected
because the talk graph always contains self-loops.
"""

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.models.modules import gru, gru_init, gumbel_softmax, linear, linear_init
from uav_bs_ctrl_tpu.ops.masked import masked_softmax

_NEG_BIG = -1e30


def _aggregate_mean(msg, adj):
    """Mean over valid in-edges: msg [..., S, D], adj [..., S, Dst] -> [..., Dst, D]."""
    w = adj.astype(msg.dtype)
    total = jnp.einsum("...sj,...sd->...jd", w, msg)
    count = jnp.sum(w, axis=-2)[..., None]
    return total / jnp.maximum(count, 1)


class BaseComm:
    def __init__(self, args):
        self.hidden = args.hidden_size
        self.msg_size = args.msg_size

    def init(self, key):
        k_msg, k_udt = jax.random.split(key)
        return {
            "f_msg": linear_init(k_msg, 2 * self.hidden, self.msg_size),
            "f_udt": gru_init(k_udt, self.hidden + self.msg_size, self.hidden),
        }

    def apply(self, p, adj, x, h, key=None):
        msg = linear(p["f_msg"], jnp.concatenate([x, jax.lax.stop_gradient(h)], axis=-1))
        c = _aggregate_mean(msg, adj)
        return gru(p["f_udt"], jnp.concatenate([x, c], axis=-1), h)


class DiscreteComm:
    def __init__(self, args):
        self.hidden = args.hidden_size
        self.msg_size = args.msg_size

    def init(self, key):
        k_enc, k_dec, k_udt = jax.random.split(key, 3)
        return {
            "f_enc": linear_init(k_enc, 2 * self.hidden, 2 * self.msg_size),
            "f_dec": linear_init(k_dec, 2 * self.msg_size, 2 * self.msg_size),
            "f_udt": gru_init(k_udt, self.hidden + 2 * self.msg_size, self.hidden),
        }

    def apply(self, p, adj, x, h, key):
        n_src = x.shape[-2]
        n_dst = adj.shape[-1]
        logits = linear(p["f_enc"], jnp.concatenate([x, jax.lax.stop_gradient(h)], axis=-1))
        # Per-EDGE Gumbel sampling (the reference samples in the DGL message
        # function, so each edge re-samples even from the same source).
        edge_logits = jnp.broadcast_to(
            logits[..., :, None, :].reshape(logits.shape[:-2] + (n_src, 1, self.msg_size, 2)),
            logits.shape[:-2] + (n_src, n_dst, self.msg_size, 2))
        bits = gumbel_softmax(key, edge_logits, tau=0.5, hard=True)
        flat = bits.reshape(bits.shape[:-2] + (2 * self.msg_size,))  # [..., S, Dst, 2*msg]
        # Elementwise-max (OR) over valid in-edges; no edges -> zeros.
        masked = jnp.where(adj[..., None], flat, _NEG_BIG)
        c = jnp.max(masked, axis=-3)
        c = jnp.where(c <= _NEG_BIG / 2, 0.0, c)
        dec = linear(p["f_dec"], c)
        return gru(p["f_udt"], jnp.concatenate([x, dec], axis=-1), h)


class CommNet:
    def __init__(self, args):
        self.hidden = args.hidden_size
        self.n_rounds = args.n_rounds

    def init(self, key):
        k_c, k_f = jax.random.split(key)
        return {
            "c_mod": linear_init(k_c, self.hidden, self.hidden),
            "f_mod": gru_init(k_f, self.hidden, self.hidden),
        }

    def apply(self, p, adj, x, h, key=None):
        for _ in range(self.n_rounds):
            c = _aggregate_mean(jax.lax.stop_gradient(h), adj)
            h = gru(p["f_mod"], x + linear(p["c_mod"], c), h)
        return h


class TarMAC:
    def __init__(self, args):
        self.hidden = args.hidden_size
        self.msg_size = args.msg_size
        self.key_size = args.key_size
        self.n_rounds = args.n_rounds
        # 'dense' (default) or 'graph_parallel': partition the talk graph's
        # source-agent axis over the registered mesh axis (the A^2-edge
        # relation that grows quadratically with swarm size) — see
        # ``parallel.graph_parallel.tarmac_attention_graph_parallel``.
        self.backend = getattr(args, "comm_backend", "dense")

    def init(self, key):
        k_v, k_s, k_q, k_u = jax.random.split(key, 4)
        return {
            "f_val": linear_init(k_v, 2 * self.hidden, self.msg_size),
            "f_sign": linear_init(k_s, 2 * self.hidden, self.key_size),
            "f_que": linear_init(k_q, 2 * self.hidden, self.key_size),
            "f_udt": gru_init(k_u, self.hidden + self.msg_size, self.hidden),
        }

    def apply(self, p, adj, x, h, key=None):
        for _ in range(self.n_rounds):
            inputs = jnp.concatenate([x, jax.lax.stop_gradient(h)], axis=-1)
            v = linear(p["f_val"], inputs)     # [..., S, msg]
            s = linear(p["f_sign"], inputs)    # [..., S, key]
            q = linear(p["f_que"], inputs)     # [..., D, key]
            c = self._attention(s, q, v, adj)
            h = gru(p["f_udt"], jnp.concatenate([x, c], axis=-1), h)
        return h

    def _attention(self, s, q, v, adj):
        """Per-destination softmax attention over valid source agents."""
        if self.backend == "graph_parallel":
            from uav_bs_ctrl_tpu.parallel.graph_parallel import (
                get_graph_parallel_mesh, tarmac_attention_graph_parallel)
            mesh, axis = get_graph_parallel_mesh()
            if mesh is not None:
                return tarmac_attention_graph_parallel(
                    s, q, v, adj, self.key_size, mesh, axis=axis)
            # Fail loudly like the gatv2 path: a comm-only graph-parallel
            # config must not silently misreport that the distributed talk
            # attention ran (ADVICE r4).
            from uav_bs_ctrl_tpu.models.encoders import _warn_graph_parallel_fallback
            _warn_graph_parallel_fallback("tarmac_talk")
        scores = jnp.einsum("...sk,...dk->...sd", s, q) / self.key_size  # SDDMM
        alpha = masked_softmax(scores, adj, axis=-2)  # softmax over sources per dst
        return jnp.einsum("...sd,...sm->...dm", alpha, v)  # attention SpMM


class EdgeConv:
    def __init__(self, args):
        self.hidden = args.hidden_size
        self.msg_size = args.msg_size
        self.n_rounds = args.n_rounds

    def init(self, key):
        k_m, k_u = jax.random.split(key)
        return {
            "f_msg": linear_init(k_m, 4 * self.hidden, self.msg_size),
            "f_udt": gru_init(k_u, self.hidden + self.msg_size, self.hidden),
        }

    def apply(self, p, adj, x, h, key=None):
        n_src = x.shape[-2]
        n_dst = adj.shape[-1]
        for _ in range(self.n_rounds):
            hd = jax.lax.stop_gradient(h)
            src_feat = jnp.concatenate([x, hd], axis=-1)[..., :, None, :]  # [..., S, 1, 2H]
            dst_feat = jnp.concatenate([x, hd], axis=-1)[..., None, :, :]  # [..., 1, D, 2H]
            pair = jnp.concatenate([
                jnp.broadcast_to(src_feat, src_feat.shape[:-3] + (n_src, n_dst, 2 * self.hidden)),
                jnp.broadcast_to(dst_feat, dst_feat.shape[:-3] + (n_src, n_dst, 2 * self.hidden)),
            ], axis=-1)
            msg = linear(p["f_msg"], pair)  # [..., S, D, msg]
            w = adj.astype(msg.dtype)[..., None]
            c = jnp.sum(msg * w, axis=-3) / jnp.maximum(jnp.sum(w, axis=-3), 1)
            h = gru(p["f_udt"], jnp.concatenate([x, c], axis=-1), h)
        return h


COMM_REGISTRY = {
    "base": BaseComm,
    "disc": DiscreteComm,
    "commnet": CommNet,
    "tarmac": TarMAC,
    "econv": EdgeConv,
}
