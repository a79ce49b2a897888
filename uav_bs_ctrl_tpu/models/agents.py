"""Recurrent agents: MLP/GNN observation encoding, optional graph comm, Q head.

Activation-parity surface:

- ``RnnAgent``     — reference ``algos/madrqn/agents/rnn_agents.py:6-35`` and
  ``algos/drqn/agents/rnn_agents.py``: MLP(obs) -> GRUCell -> Linear(Q).
- ``GnnAgent``     — reference ``algos/madrqn/agents/gnn_agents.py:12-56``:
  encoder (Dense or GraphObservationEncoder) -> comm protocol on the talk
  graph (or plain GRUCell when no comm) -> (dueling) Q head.
- ``DrqnGnnAgent`` — reference ``algos/drqn/agents/gnn_agents.py:9-30``:
  single GATv2 (gt->agent 'seen-by'), GRUCell, Linear(Q).

Agent selection rule (reference ``algos/madrqn/learner.py:62-67``): RnnAgent
iff o=='mlp' and c is None; otherwise GnnAgent.

Interface: ``init(key) -> params``; ``apply(params, obs, h, key=None) ->
(q_logits, h')``.  ``obs`` is a dict pytree with leading agent dim [..., A]:
'agent' flat features, optional 'gt'/'ubs' padded neighborhoods (flag column
0 = mask), optional 'adj' talk adjacency [..., A, A].  ``key`` is only
consumed by DiscreteComm's Gumbel sampling.

TPU-first split: every agent also exposes ``encode(params, obs) -> x`` (the
h-independent observation encoding — MLP or GATv2 attention) and
``step(params, x, adj, h, key) -> (q, h')`` (the recurrent comm/GRU/head
part), with ``apply = step . encode``.  BPTT exploits this: the encoder has
no time dependency, so the update batches it over ALL timesteps in one MXU
call and scans only ``step`` (see ``algos/core.py _loss_fn``) — the
dominant GAT work leaves the sequential scan entirely.
"""

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.models.comm import COMM_REGISTRY
from uav_bs_ctrl_tpu.models.encoders import (DenseObservationEncoder,
                                             GraphObservationEncoder, gatv2, gatv2_init)
from uav_bs_ctrl_tpu.models.heads import DuelingLayer
from uav_bs_ctrl_tpu.models.modules import gru, gru_init, linear, linear_init, mlp, mlp_init


class RnnAgent:
    """MLP encoder -> GRU -> (dueling) Q head; used when obs is flat and no comm."""

    def __init__(self, obs_shape: int, n_actions: int, args):
        self.obs_shape = obs_shape
        self.n_actions = n_actions
        self.hidden = args.hidden_size
        self.n_layers = args.n_layers
        self.dueling = getattr(args, "dueling", False)
        self.f_out = DuelingLayer(self.hidden, n_actions) if self.dueling else None

    def init(self, key):
        k_enc, k_rnn, k_out = jax.random.split(key, 3)
        params = {
            "enc": mlp_init(k_enc, self.obs_shape, self.hidden, self.n_layers),
            "rnn": gru_init(k_rnn, self.hidden, self.hidden),
        }
        params["f_out"] = (self.f_out.init(k_out) if self.dueling
                           else linear_init(k_out, self.hidden, self.n_actions))
        return params

    def init_hidden(self):
        return jnp.zeros((1, self.hidden))

    def encode(self, p, obs):
        return mlp(p["enc"], obs["agent"] if isinstance(obs, dict) else obs)

    def step(self, p, x, adj, h, key=None):
        h = gru(p["rnn"], x, h)
        q = self.f_out.apply(p["f_out"], h) if self.dueling else linear(p["f_out"], h)
        return q, h

    def apply(self, p, obs, h, key=None):
        return self.step(p, self.encode(p, obs), None, h, key)


class GnnAgent:
    """Encoder (MLP or hetero-GATv2) -> comm protocol / GRU -> (dueling) Q head."""

    def __init__(self, obs_shape, n_actions, args):
        self.n_actions = n_actions
        self.hidden = args.hidden_size
        self.comm_protocol = args.c

        if isinstance(obs_shape, int):
            self.enc = DenseObservationEncoder(obs_shape, args)
        elif isinstance(obs_shape, dict):
            self.enc = GraphObservationEncoder(obs_shape, args)
        else:
            raise TypeError(f"Unsupported obs_shape {obs_shape!r}")

        if self.comm_protocol is None:
            self.f_comm = None
        elif self.comm_protocol in COMM_REGISTRY:
            self.f_comm = COMM_REGISTRY[self.comm_protocol](args)
        else:
            raise KeyError("Unsupported communication scheme.")

        self.dueling = getattr(args, "dueling", False)
        self.f_out = DuelingLayer(self.hidden, n_actions) if self.dueling else None
        # 'xla' (default) or 'pallas': fuse the ENTIRE recurrent step —
        # TarMAC comm + GRU + (dueling) head — into one Pallas kernel per
        # scan iteration (custom-VJP backward), collapsing the per-step
        # launch/fusion-boundary chain the scan-BPTT update is latency-bound
        # on.  Only defined for c='tarmac' with n_rounds=1 (enforced by
        # check_args_sanity).
        self.step_backend = getattr(args, "step_backend", "xla")
        self._pallas_step = (self.step_backend == "pallas"
                             and self.comm_protocol == "tarmac"
                             and getattr(args, "n_rounds", 1) == 1)
        self.key_size = getattr(args, "key_size", 16)

    def init(self, key):
        k_enc, k_comm, k_out = jax.random.split(key, 3)
        params = {"enc": self.enc.init(k_enc)}
        if self.f_comm is not None:
            params["f_comm"] = self.f_comm.init(k_comm)
        else:
            params["rnn"] = gru_init(k_comm, self.hidden, self.hidden)
        params["f_out"] = (self.f_out.init(k_out) if self.dueling
                           else linear_init(k_out, self.hidden, self.n_actions))
        return params

    def init_hidden(self):
        return jnp.zeros((1, self.hidden))

    def encode(self, p, obs):
        return self.enc.apply(p["enc"], obs)   # [..., A, hidden]

    def step(self, p, x, adj, h, key=None):
        if self._pallas_step:
            return self._step_pallas(p, x, adj, h)
        if self.f_comm is not None:
            h = self.f_comm.apply(p["f_comm"], adj, x, h, key)
        else:
            h = gru(p["rnn"], x, h)
        q = self.f_out.apply(p["f_out"], h) if self.dueling else linear(p["f_out"], h)
        return q, h

    def _step_pallas(self, p, x, adj, h):
        """Fused recurrent step (ops.step_kernels): flatten [..., A, H] rows
        world-major, run one kernel, restore the leading shape."""
        from uav_bs_ctrl_tpu.ops.step_kernels import tarmac_step_train
        # Kernel I/O is f32: the kernel accumulates in f32 regardless (the
        # step is latency-, not bandwidth-, bound), and f32 blocks sidestep
        # Mosaic's stricter 16-bit tiling on the small-lane operands
        # (adjf [R, A], biases, the 1-wide dueling V head).  Under bf16
        # mixed precision the inputs are already bf16-rounded, so the
        # round-trip is exact; outputs are cast back to the carry dtype.
        f32 = lambda t: t.astype(jnp.float32)
        pc = jax.tree_util.tree_map(f32, p["f_comm"])
        po = jax.tree_util.tree_map(f32, p["f_out"])
        a = x.shape[-2]
        lead = x.shape[:-2]
        x2 = f32(x.reshape((-1, x.shape[-1])))
        h2 = f32(h.reshape((-1, h.shape[-1])))
        adjf = jnp.broadcast_to(adj, lead + (a, a)).reshape((-1, a)) \
            .astype(jnp.float32)
        if self.dueling:
            wo, bo = po["adv"]["w"], po["adv"]["b"]
            wvh, bvh = po["v"]["w"], po["v"]["b"]
        else:
            wo, bo = po["w"], po["b"]
            wvh = jnp.zeros((h.shape[-1], 1), jnp.float32)
            bvh = jnp.zeros((1,), jnp.float32)
        q, h_new = tarmac_step_train(
            x2, h2, adjf,
            pc["f_val"]["w"], pc["f_val"]["b"],
            pc["f_sign"]["w"], pc["f_sign"]["b"],
            pc["f_que"]["w"], pc["f_que"]["b"],
            pc["f_udt"]["wi"], pc["f_udt"]["wh"],
            pc["f_udt"]["bi"], pc["f_udt"]["bh"],
            wo, bo, wvh, bvh, a, self.key_size, self.dueling)
        return (q.reshape(lead + (a, q.shape[-1])).astype(x.dtype),
                h_new.reshape(lead + (a, h_new.shape[-1])).astype(h.dtype))

    def apply(self, p, obs, h, key=None):
        adj = obs.get("adj") if isinstance(obs, dict) else None
        return self.step(p, self.encode(p, obs), adj, h, key)


class DrqnGnnAgent:
    """Single-relation GATv2 (gt->agent) -> GRU -> Linear(Q) (exp1 agent).

    The drqn graph builder attaches ALL GT rows with their full feature
    vectors (no visibility flag; reference ``algos/drqn/utils/env_wrappers.py:63-77``),
    so the neighborhood mask is all-ones.
    """

    def __init__(self, obs_shape: dict, n_actions: int, args):
        self.d_agent = obs_shape["agent"]
        self.d_gt = obs_shape["gt"]
        self.n_actions = n_actions
        self.hidden = args.hidden_size
        self.n_heads = args.n_heads
        assert self.hidden % self.n_heads == 0

    def init(self, key):
        k_enc, k_rnn, k_out = jax.random.split(key, 3)
        return {
            "enc": gatv2_init(k_enc, self.d_gt, self.d_agent, self.n_heads,
                              self.hidden // self.n_heads),
            "rnn": gru_init(k_rnn, self.hidden, self.hidden),
            "f_out": linear_init(k_out, self.hidden, self.n_actions),
        }

    def init_hidden(self):
        return jnp.zeros((1, self.hidden))

    def encode(self, p, obs):
        mask = jnp.ones(obs["gt"].shape[:-1], dtype=bool)
        return gatv2(p["enc"], obs["gt"], obs["agent"], mask, self.n_heads)

    def step(self, p, x, adj, h, key=None):
        h = gru(p["rnn"], x, h)
        return linear(p["f_out"], h), h

    def apply(self, p, obs, h, key=None):
        return self.step(p, self.encode(p, obs), None, h, key)


def build_agent(obs_shape, n_actions, args):
    """madrqn agent dispatch (reference ``algos/madrqn/learner.py:62-67``)."""
    if getattr(args, "o", "mlp") == "mlp" and getattr(args, "c", None) is None:
        return RnnAgent(obs_shape, n_actions, args)
    return GnnAgent(obs_shape, n_actions, args)


# Name-keyed registries (parity with the reference's agent REGISTRY dicts,
# ``algos/{drqn,madrqn}/agents/__init__.py``).
REGISTRY = {
    "rnn": RnnAgent,
    "gnn": GnnAgent,
}

DRQN_REGISTRY = {
    "rnn": RnnAgent,
    "gnn": DrqnGnnAgent,
}
