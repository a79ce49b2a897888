"""Primitive neural modules: Linear, MLP, GRU cell.

Functional style: ``*_init(key, ...) -> params`` (nested dict of jnp arrays)
and pure apply functions.  Initialization distributions match PyTorch defaults
(the reference trains with ``nn.Linear`` / ``nn.GRUCell``; matching init keeps
training dynamics comparable):

- Linear: W, b ~ U(-k, k) with k = 1/sqrt(fan_in)  (torch ``nn.Linear``).
- GRUCell: all weights/biases ~ U(-1/sqrt(H), 1/sqrt(H)) (torch ``nn.GRUCell``),
  gate order (reset, update, new), h' = (1-z)*n + z*h.

Weights are stored transposed relative to torch ([in, out]) so application is
``x @ w`` — the layout XLA prefers for row-major batched matmul.
"""

import jax
import jax.numpy as jnp


def linear_init(key, in_f, out_f, dtype=jnp.float32):
    k = 1.0 / jnp.sqrt(jnp.asarray(in_f, dtype))
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (in_f, out_f), dtype, -k, k),
        "b": jax.random.uniform(bkey, (out_f,), dtype, -k, k),
    }


def linear(p, x):
    return x @ p["w"] + p["b"]


def xavier_normal_init(key, in_f, out_f, gain=1.0, dtype=jnp.float32):
    """Xavier-normal weight + torch-Linear-uniform bias (DGL GATv2 layout)."""
    std = gain * jnp.sqrt(2.0 / (in_f + out_f))
    wkey, bkey = jax.random.split(key)
    k = 1.0 / jnp.sqrt(jnp.asarray(in_f, dtype))
    return {
        "w": std * jax.random.normal(wkey, (in_f, out_f), dtype),
        "b": jax.random.uniform(bkey, (out_f,), dtype, -k, k),
    }


def mlp_init(key, in_f, hidden, n_layers, dtype=jnp.float32):
    """``n_layers`` x (Linear -> ReLU) stack (reference encoder shape)."""
    keys = jax.random.split(key, n_layers)
    layers = [linear_init(keys[0], in_f, hidden, dtype)]
    for i in range(1, n_layers):
        layers.append(linear_init(keys[i], hidden, hidden, dtype))
    return {"layers": layers}


def mlp(p, x):
    for layer in p["layers"]:
        x = jax.nn.relu(linear(layer, x))
    return x


def gru_init(key, in_f, hidden, dtype=jnp.float32):
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden, dtype))
    keys = jax.random.split(key, 4)
    return {
        "wi": jax.random.uniform(keys[0], (in_f, 3 * hidden), dtype, -k, k),
        "wh": jax.random.uniform(keys[1], (hidden, 3 * hidden), dtype, -k, k),
        "bi": jax.random.uniform(keys[2], (3 * hidden,), dtype, -k, k),
        "bh": jax.random.uniform(keys[3], (3 * hidden,), dtype, -k, k),
    }


def gru(p, x, h):
    """GRU cell step; x: [..., in], h: [..., H] -> h': [..., H]."""
    hidden = h.shape[-1]
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    del hidden
    return (1 - z) * n + z * h


def gumbel_softmax(key, logits, tau=1.0, hard=False):
    """Gumbel-softmax over the last axis (torch ``F.gumbel_softmax`` semantics).

    Used by DiscreteComm (reference ``gnn_agents.py:172``): per-edge sampling
    with hard one-hot forward and soft (straight-through) gradients.
    """
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    if not hard:
        return y_soft
    y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), logits.shape[-1], dtype=logits.dtype)
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)
