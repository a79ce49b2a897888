"""Dense masked neighborhood reductions.

Semantics contract (shared with the ``segment`` backend and the reference's
DGL kernels):

- ``masked_softmax``: softmax over valid entries; rows with **zero** valid
  entries produce exactly 0 (matching DGL ``edge_softmax`` + sum-aggregation
  over an empty in-edge set, and the explicit zero-padding in the reference
  comm protocols, ``gnn_agents.py:141,186,296``).
- ``masked_mean``: mean over valid entries; zero valid -> 0.
- ``masked_max``: max over valid entries; zero valid -> 0 (the reference's
  DiscreteComm aggregates one-hot bits whose max is always >= 0, and pads
  zeros for empty mailboxes).

All functions broadcast: ``mask`` must be broadcastable to ``x``'s shape with
size-1 trailing dims allowed.
"""

import jax.numpy as jnp

_NEG_BIG = -1e30


def masked_softmax(x, mask, axis):
    """Softmax of ``x`` over ``axis`` restricted to ``mask``; all-masked rows -> 0."""
    mask = jnp.broadcast_to(mask, x.shape)
    x_masked = jnp.where(mask, x, _NEG_BIG)
    x_max = jnp.max(x_masked, axis=axis, keepdims=True)
    # Guard all-masked rows: shift by 0 instead of -1e30 to avoid inf-inf.
    x_max = jnp.where(x_max <= _NEG_BIG / 2, 0.0, x_max)
    unnorm = jnp.where(mask, jnp.exp(x - x_max), 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


def masked_sum(x, mask, axis):
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis)


def masked_mean(x, mask, axis):
    """Mean over valid entries (divides by the valid count, not the axis size)."""
    mask = jnp.broadcast_to(mask, x.shape)
    total = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1)


def masked_max(x, mask, axis):
    """Max over valid entries; rows with no valid entries yield 0."""
    mask = jnp.broadcast_to(mask, x.shape)
    m = jnp.max(jnp.where(mask, x, _NEG_BIG), axis=axis)
    return jnp.where(m <= _NEG_BIG / 2, 0.0, m)
