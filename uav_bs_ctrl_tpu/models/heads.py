"""Output heads: dueling Q decomposition and the QMIX monotonic mixer.

Activation-parity surface:

- ``DuelingLayer`` — reference ``algos/madrqn/agents/dueling.py:4-16``:
  Q = V + (A - mean(A)).
- ``QMixer`` — reference ``algos/madrqn/agents/mixers.py:6-49``: hypernetwork
  with abs() first/final weights (monotonicity), ELU hidden, state-value V(s)
  bias; mixes per-agent Q [T, B, A] with states [T, B, ds] -> q_tot [T, B, 1].
"""

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.models.modules import linear, linear_init


class DuelingLayer:
    def __init__(self, in_feats, n_actions):
        self.in_feats = in_feats
        self.n_actions = n_actions

    def init(self, key):
        k_adv, k_v = jax.random.split(key)
        return {
            "adv": linear_init(k_adv, self.in_feats, self.n_actions),
            "v": linear_init(k_v, self.in_feats, 1),
        }

    def apply(self, p, x):
        vals = linear(p["v"], x)
        advs = linear(p["adv"], x)
        return vals + (advs - jnp.mean(advs, axis=-1, keepdims=True))


class QMixer:
    def __init__(self, state_shape, n_agents, args):
        self.state_dim = state_shape
        self.n_agents = n_agents
        self.embed_dim = args.embed_dim

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "hyper_w1": linear_init(k1, self.state_dim, self.embed_dim * self.n_agents),
            "hyper_wf": linear_init(k2, self.state_dim, self.embed_dim),
            "hyper_b1": linear_init(k3, self.state_dim, self.embed_dim),
            "v1": linear_init(k4, self.state_dim, self.embed_dim),
            "v2": linear_init(k5, self.embed_dim, 1),
        }

    def apply(self, p, agent_qs, states):
        """agent_qs: [..., A]; states: [..., ds] -> q_tot [..., 1]."""
        w1 = jnp.abs(linear(p["hyper_w1"], states))
        w1 = w1.reshape(states.shape[:-1] + (self.n_agents, self.embed_dim))
        b1 = linear(p["hyper_b1"], states)
        hidden = jax.nn.elu(jnp.einsum("...a,...ae->...e", agent_qs, w1) + b1)

        wf = jnp.abs(linear(p["hyper_wf"], states))
        v = linear(p["v2"], jax.nn.relu(linear(p["v1"], states)))
        return jnp.sum(hidden * wf, axis=-1, keepdims=True) + v
