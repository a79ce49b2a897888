"""Cross-backend golden tests: segment (padded edge list) vs masked (dense).

The two layouts must implement the identical aggregation contract; the Pallas
kernels are later validated against the same goldens.
"""

import numpy as np
import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops import segment
from uav_bs_ctrl_tpu.ops.masked import masked_max, masked_mean, masked_softmax, masked_sum

RNG = np.random.default_rng(0)


def _random_graph(n_src=7, n_dst=5, p=0.5):
    adj = RNG.random((n_src, n_dst)) > p
    adj[:, 0] = False  # one isolated destination
    src, dst, mask = segment.dense_to_edges(jnp.asarray(adj))
    return adj, src, dst, mask


def test_segment_sum_matches_dense():
    adj, src, dst, mask = _random_graph()
    vals = jnp.asarray(RNG.normal(size=(7, 3)).astype(np.float32))
    edge_vals = segment.gather_src(vals, src)
    for backend in ("xla", "onehot"):
        out = segment.segment_sum(edge_vals, dst, mask, 5, backend=backend)
        expect = np.asarray(adj, np.float32).T @ np.asarray(vals)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_segment_mean_matches_masked_mean():
    adj, src, dst, mask = _random_graph()
    vals = jnp.asarray(RNG.normal(size=(7, 4)).astype(np.float32))
    edge_vals = segment.gather_src(vals, src)
    out = segment.segment_mean(edge_vals, dst, mask, 5)
    # Dense twin: mean over sources s with adj[s, d].
    dense = masked_mean(jnp.broadcast_to(vals[:, None, :], (7, 5, 4)),
                        jnp.asarray(adj)[..., None], axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_segment_max_matches_masked_max():
    adj, src, dst, mask = _random_graph()
    vals = jnp.asarray(RNG.normal(size=(7, 4)).astype(np.float32))
    edge_vals = segment.gather_src(vals, src)
    out = segment.segment_max(edge_vals, dst, mask, 5)
    dense = masked_max(jnp.broadcast_to(vals[:, None, :], (7, 5, 4)),
                       jnp.asarray(adj)[..., None], axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_segment_softmax_matches_masked_softmax():
    adj, src, dst, mask = _random_graph()
    scores_dense = RNG.normal(size=(7, 5)).astype(np.float32)  # [S, D]
    edge_scores = jnp.asarray(scores_dense.reshape(-1))        # row-major matches dense_to_edges
    alpha = segment.segment_softmax(edge_scores, dst, mask, 5)
    dense = masked_softmax(jnp.asarray(scores_dense), jnp.asarray(adj), axis=0)
    np.testing.assert_allclose(np.asarray(alpha).reshape(7, 5), np.asarray(dense), atol=1e-5)


def test_sddmm_and_attention_spmm_pipeline():
    """Full TarMAC-style attention computed both ways must agree."""
    adj, src, dst, mask = _random_graph(6, 6, p=0.4)
    np.fill_diagonal(adj, True)
    src, dst, mask = segment.dense_to_edges(jnp.asarray(adj))
    s = jnp.asarray(RNG.normal(size=(6, 8)).astype(np.float32))
    q = jnp.asarray(RNG.normal(size=(6, 8)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(6, 3)).astype(np.float32))

    # Sparse path.
    e = segment.sddmm_dot(s, q, src, dst) / 8.0
    alpha = segment.segment_softmax(e, dst, mask, 6)
    out = segment.spmm_attention(alpha, v, src, dst, mask, 6)

    # Dense path.
    scores = (np.asarray(s) @ np.asarray(q).T) / 8.0
    alpha_d = masked_softmax(jnp.asarray(scores), jnp.asarray(adj), axis=0)
    out_d = jnp.einsum("sd,sm->dm", alpha_d, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_d), atol=1e-5)


def test_segment_ops_jit_and_grad():
    adj, src, dst, mask = _random_graph()
    vals = jnp.asarray(RNG.normal(size=(7, 3)).astype(np.float32))

    @jax.jit
    def loss(v):
        e = segment.gather_src(v, src)
        a = segment.segment_softmax(jnp.sum(e, -1), dst, mask, 5)
        return jnp.sum(segment.spmm_attention(a, v, src, dst, mask, 5) ** 2)

    g = jax.grad(loss)(vals)
    assert np.isfinite(np.asarray(g)).all()
