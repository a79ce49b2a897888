"""Padded edge-list (CSR-flavored) graph primitives.

A relation is ``(src_idx, dst_idx, edge_mask)`` arrays padded to a static
``E_max`` — visibility changes are mask flips, never shape changes, so XLA
compiles once.  These cover the reference's DGL native-kernel surface:

- ``gather_src``        — edge-parallel feature gather (DGL UDF ``edges.src``)
- ``sddmm_dot``         — per-edge dot scores (DGL ``fn.u_dot_v``)
- ``segment_softmax``   — per-destination softmax (DGL ``edge_softmax``)
- ``segment_sum/mean/max`` — SpMM-style aggregation (``fn.sum`` / mailbox
  ``.mean(1)`` / ``.max(1)``)

Backends: ``xla`` (scatter via ``jax.ops.segment_sum``) and ``onehot``
(scatter as one-hot matmul — runs on the MXU; preferable for small N_dst).
The Pallas TPU kernels in ``ops.pallas_kernels`` implement the same contract
for large graphs.

All-masked destinations produce 0, matching ``ops.masked`` and DGL's
zero-in-degree semantics.
"""

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def gather_src(x_src, src_idx):
    """Per-edge gather of source-node features: [N_src, D] -> [E, D]."""
    return jnp.take(x_src, src_idx, axis=0)


def sddmm_dot(a_src, b_dst, src_idx, dst_idx):
    """Per-edge dot product a[src] . b[dst] -> [E, ...] (heads broadcast)."""
    a_e = jnp.take(a_src, src_idx, axis=0)
    b_e = jnp.take(b_dst, dst_idx, axis=0)
    return jnp.sum(a_e * b_e, axis=-1)


def segment_sum(values, dst_idx, edge_mask, num_dst, backend="xla"):
    """Sum edge values into destination buckets. values: [E, ...]."""
    values = jnp.where(_expand(edge_mask, values), values, 0.0)
    if backend == "onehot":
        onehot = jax.nn.one_hot(dst_idx, num_dst, dtype=values.dtype)  # [E, N]
        flat = values.reshape(values.shape[0], -1)
        out = jnp.einsum("en,ed->nd", onehot, flat)
        return out.reshape((num_dst,) + values.shape[1:])
    return jax.ops.segment_sum(values, dst_idx, num_segments=num_dst)


def segment_mean(values, dst_idx, edge_mask, num_dst, backend="xla"):
    """Mean over valid in-edges per destination; zero valid -> 0."""
    total = segment_sum(values, dst_idx, edge_mask, num_dst, backend)
    ones = edge_mask.astype(values.dtype)
    count = segment_sum(ones, dst_idx, edge_mask, num_dst, backend)
    count = count.reshape((num_dst,) + (1,) * (total.ndim - 1))
    return total / jnp.maximum(count, 1)


def segment_max(values, dst_idx, edge_mask, num_dst):
    """Max over valid in-edges per destination; zero valid -> 0."""
    masked = jnp.where(_expand(edge_mask, values), values, _NEG_BIG)
    out = jax.ops.segment_max(masked, dst_idx, num_segments=num_dst)
    return jnp.where(out <= _NEG_BIG / 2, 0.0, out)


def segment_softmax(scores, dst_idx, edge_mask, num_dst, backend="xla"):
    """Per-destination softmax over in-edges. scores: [E, ...]; masked -> 0."""
    masked = jnp.where(_expand(edge_mask, scores), scores, _NEG_BIG)
    seg_max = jax.ops.segment_max(masked, dst_idx, num_segments=num_dst)
    seg_max = jnp.where(seg_max <= _NEG_BIG / 2, 0.0, seg_max)
    shifted = scores - jnp.take(seg_max, dst_idx, axis=0)
    unnorm = jnp.where(_expand(edge_mask, scores), jnp.exp(shifted), 0.0)
    denom = segment_sum(unnorm, dst_idx, edge_mask, num_dst, backend)
    denom_e = jnp.take(denom, dst_idx, axis=0)
    return unnorm / jnp.maximum(denom_e, 1e-30)


def spmm_attention(alpha, values, src_idx, dst_idx, edge_mask, num_dst, backend="xla"):
    """Attention-weighted SpMM: out[d] = sum_e alpha_e * values[src_e].

    alpha: [E] or [E, H]; values: [N_src, D] or [N_src, H, D].
    """
    v_e = jnp.take(values, src_idx, axis=0)
    msg = v_e * alpha[(...,) + (None,) * (v_e.ndim - alpha.ndim)]
    return segment_sum(msg, dst_idx, edge_mask, num_dst, backend)


def _expand(mask, values):
    return mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim))


def dense_to_edges(adj):
    """Convert an [N_src, N_dst] adjacency mask to a full padded edge list.

    Returns (src_idx, dst_idx, edge_mask) with E = N_src * N_dst; the edge
    order is row-major (all destinations of src 0, then src 1, ...).
    """
    n_src, n_dst = adj.shape
    src = jnp.repeat(jnp.arange(n_src), n_dst)
    dst = jnp.tile(jnp.arange(n_dst), n_src)
    return src, dst, adj.reshape(-1)
