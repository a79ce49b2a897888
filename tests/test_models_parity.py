"""Activation parity: JAX modules vs torch oracles with identical weights.

Each oracle is an independent torch implementation of the documented math
(SURVEY.md §2.3 D1-D10); weights are generated in JAX and injected into the
oracle, then outputs are compared allclose.  Masked/zero-in-degree edge cases
(empty neighborhoods) are exercised explicitly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from types import SimpleNamespace as SN

from uav_bs_ctrl_tpu.models import modules
from uav_bs_ctrl_tpu.models.comm import BaseComm, CommNet, DiscreteComm, EdgeConv, TarMAC
from uav_bs_ctrl_tpu.models.encoders import GraphObservationEncoder, gatv2, gatv2_init
from uav_bs_ctrl_tpu.models.heads import DuelingLayer, QMixer
from uav_bs_ctrl_tpu.ops.masked import masked_mean, masked_softmax

ATOL = 2e-5


def t(x):
    return torch.as_tensor(np.asarray(x))


def make_args(**kw):
    base = dict(hidden_size=32, n_layers=2, n_heads=4, msg_size=16, key_size=8,
                n_rounds=2, embed_dim=8, dueling=False, c=None)
    base.update(kw)
    return SN(**base)


# --------------------------------------------------------------------------- #
# Primitives


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    p = modules.linear_init(key, 5, 7)
    x = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    mine = modules.linear(p, jnp.asarray(x))
    ref = F.linear(t(x), t(p["w"]).T, t(p["b"]))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=ATOL)


def test_gru_matches_torch():
    key = jax.random.PRNGKey(1)
    p = modules.gru_init(key, 6, 4)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 6)).astype(np.float32)
    h = rng.normal(size=(3, 4)).astype(np.float32)

    cell = torch.nn.GRUCell(6, 4)
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["wi"]).T)
        cell.weight_hh.copy_(t(p["wh"]).T)
        cell.bias_ih.copy_(t(p["bi"]))
        cell.bias_hh.copy_(t(p["bh"]))

    mine = modules.gru(p, jnp.asarray(x), jnp.asarray(h))
    ref = cell(t(x), t(h))
    np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(), atol=ATOL)


def test_masked_softmax_matches_subset_softmax():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 6)).astype(np.float32)
    mask = rng.random((4, 6)) > 0.4
    mask[2] = False  # one all-masked row
    out = np.asarray(masked_softmax(jnp.asarray(x), jnp.asarray(mask), axis=-1))
    for i in range(4):
        if mask[i].any():
            sub = torch.softmax(t(x[i][mask[i]]), dim=0).numpy()
            np.testing.assert_allclose(out[i][mask[i]], sub, atol=ATOL)
            np.testing.assert_allclose(out[i][~mask[i]], 0.0, atol=ATOL)
        else:
            np.testing.assert_allclose(out[i], 0.0, atol=ATOL)


def test_masked_mean_zero_when_empty():
    x = jnp.ones((2, 3, 5))
    mask = jnp.zeros((2, 3, 1), dtype=bool)
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask, axis=-2)), 0.0)


def test_gumbel_softmax_straight_through():
    key = jax.random.PRNGKey(3)
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(5, 4, 2)).astype(np.float32))
    out = modules.gumbel_softmax(key, logits, tau=0.5, hard=True)
    # Forward values are exact one-hots.
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-6)
    assert set(np.unique(np.asarray(out))).issubset({0.0, 1.0})
    # Gradients flow (straight-through).
    g = jax.grad(lambda l: modules.gumbel_softmax(key, l, 0.5, True).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()


# --------------------------------------------------------------------------- #
# GATv2 vs torch oracle (DGL 0.9 math, independently implemented)


def gatv2_oracle(p, x_src, x_dst, mask, n_heads):
    """Edge-list torch implementation of DGL-0.9 GATv2: per-dst softmax over
    visible sources, message = W_src x_src, residual + ReLU."""
    H = n_heads
    out = p["fc_src"]["w"].shape[1]
    Fh = out // H
    A, M = mask.shape
    res = F.linear(t(x_dst), t(p["res_fc"]["w"]).T, t(p["res_fc"]["b"]))
    result = torch.zeros(A, out)
    attn = t(p["attn"])  # [H, Fh]
    for a in range(A):
        vis = np.where(mask[a])[0]
        if len(vis) == 0:
            result[a] = res[a]
            continue
        el = F.linear(t(x_src[a, vis]), t(p["fc_src"]["w"]).T, t(p["fc_src"]["b"])).view(-1, H, Fh)
        er = F.linear(t(x_dst[a:a + 1]), t(p["fc_dst"]["w"]).T, t(p["fc_dst"]["b"])).view(1, H, Fh)
        e = F.leaky_relu(el + er, 0.2)
        scores = (e * attn).sum(-1)            # [E, H]
        alpha = torch.softmax(scores, dim=0)   # softmax over in-edges
        ft = (alpha.unsqueeze(-1) * el).sum(0)  # [H, Fh]
        result[a] = ft.reshape(-1) + res[a]
    return torch.relu(result)


def test_gatv2_matches_oracle():
    key = jax.random.PRNGKey(4)
    H, Fh = 4, 8
    d_src, d_dst = 5, 3
    p = gatv2_init(key, d_src, d_dst, H, Fh)
    rng = np.random.default_rng(4)
    A, M = 6, 9
    x_src = rng.normal(size=(A, M, d_src)).astype(np.float32)
    x_dst = rng.normal(size=(A, d_dst)).astype(np.float32)
    mask = rng.random((A, M)) > 0.5
    mask[3] = False  # zero-in-degree agent

    mine = gatv2(p, jnp.asarray(x_src), jnp.asarray(x_dst), jnp.asarray(mask), H)
    ref = gatv2_oracle(p, x_src, x_dst, mask, H)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=ATOL)


def test_gatv2_batched_consistent():
    """A leading batch dim must reproduce per-sample outputs exactly."""
    key = jax.random.PRNGKey(5)
    p = gatv2_init(key, 4, 2, 2, 3)
    rng = np.random.default_rng(5)
    B, A, M = 3, 4, 5
    x_src = rng.normal(size=(B, A, M, 4)).astype(np.float32)
    x_dst = rng.normal(size=(B, A, 2)).astype(np.float32)
    mask = rng.random((B, A, M)) > 0.3

    batched = gatv2(p, jnp.asarray(x_src), jnp.asarray(x_dst), jnp.asarray(mask), 2)
    for b in range(B):
        single = gatv2(p, jnp.asarray(x_src[b]), jnp.asarray(x_dst[b]), jnp.asarray(mask[b]), 2)
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(single), atol=ATOL)


def test_graph_observation_encoder_shapes_and_masking():
    args = make_args(hidden_size=32, n_heads=4)
    enc = GraphObservationEncoder(dict(agent=2, gt=4, ubs=2), args)
    p = enc.init(jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    A, M, K = 3, 7, 2
    obs = {
        "agent": jnp.asarray(rng.normal(size=(A, 2)).astype(np.float32)),
        "gt": jnp.asarray(np.concatenate([(rng.random((A, M, 1)) > 0.5).astype(np.float32),
                                          rng.normal(size=(A, M, 4)).astype(np.float32)], -1)),
        "ubs": jnp.asarray(np.concatenate([(rng.random((A, K, 1)) > 0.5).astype(np.float32),
                                           rng.normal(size=(A, K, 2)).astype(np.float32)], -1)),
    }
    out = enc.apply(p, obs)
    assert out.shape == (A, 32)
    # Features of invisible neighbors must not affect the output.
    gt2 = np.asarray(obs["gt"]).copy()
    invisible = gt2[..., 0] == 0
    gt2[invisible, 1:] = 999.0
    out2 = enc.apply(p, {**obs, "gt": jnp.asarray(gt2)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=ATOL)


# --------------------------------------------------------------------------- #
# Communication protocols vs torch oracles


def _edge_list(adj):
    src, dst = np.where(adj)
    return list(zip(src, dst))


def test_base_comm_matches_oracle():
    args = make_args(hidden_size=8, msg_size=8)
    comm = BaseComm(args)
    p = comm.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    A = 5
    x = rng.normal(size=(A, 8)).astype(np.float32)
    h = rng.normal(size=(A, 8)).astype(np.float32)
    adj = rng.random((A, A)) > 0.4
    np.fill_diagonal(adj, True)  # self-loops, as the env builds them

    mine = comm.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(h))

    # Oracle: per-edge message, mean mailbox per destination, GRU update.
    msg = F.linear(torch.cat([t(x), t(h)], -1), t(p["f_msg"]["w"]).T, t(p["f_msg"]["b"]))
    c = torch.zeros(A, 8)
    for d in range(A):
        srcs = np.where(adj[:, d])[0]
        if len(srcs):
            c[d] = msg[srcs].mean(0)
    cell = torch.nn.GRUCell(16, 8)
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["f_udt"]["wi"]).T)
        cell.weight_hh.copy_(t(p["f_udt"]["wh"]).T)
        cell.bias_ih.copy_(t(p["f_udt"]["bi"]))
        cell.bias_hh.copy_(t(p["f_udt"]["bh"]))
    ref = cell(torch.cat([t(x), c], -1), t(h))
    np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(), atol=ATOL)


def test_commnet_matches_oracle():
    args = make_args(hidden_size=8, n_rounds=2)
    comm = CommNet(args)
    p = comm.init(jax.random.PRNGKey(8))
    rng = np.random.default_rng(8)
    A = 4
    x = rng.normal(size=(A, 8)).astype(np.float32)
    h0 = rng.normal(size=(A, 8)).astype(np.float32)
    adj = rng.random((A, A)) > 0.3
    np.fill_diagonal(adj, True)

    mine = comm.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(h0))

    cell = torch.nn.GRUCell(8, 8)
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["f_mod"]["wi"]).T)
        cell.weight_hh.copy_(t(p["f_mod"]["wh"]).T)
        cell.bias_ih.copy_(t(p["f_mod"]["bi"]))
        cell.bias_hh.copy_(t(p["f_mod"]["bh"]))
    h = t(h0)
    for _ in range(2):
        c = torch.zeros(A, 8)
        for d in range(A):
            srcs = np.where(adj[:, d])[0]
            if len(srcs):
                c[d] = h[srcs].mean(0)
        c = F.linear(c, t(p["c_mod"]["w"]).T, t(p["c_mod"]["b"]))
        h = cell(t(x) + c, h)
    np.testing.assert_allclose(np.asarray(mine), h.detach().numpy(), atol=ATOL)


def test_tarmac_matches_oracle():
    args = make_args(hidden_size=8, msg_size=6, key_size=4, n_rounds=2)
    comm = TarMAC(args)
    p = comm.init(jax.random.PRNGKey(9))
    rng = np.random.default_rng(9)
    A = 5
    x = rng.normal(size=(A, 8)).astype(np.float32)
    h0 = rng.normal(size=(A, 8)).astype(np.float32)
    adj = rng.random((A, A)) > 0.4
    np.fill_diagonal(adj, True)

    mine = comm.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(h0))

    cell = torch.nn.GRUCell(8 + 6, 8)
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["f_udt"]["wi"]).T)
        cell.weight_hh.copy_(t(p["f_udt"]["wh"]).T)
        cell.bias_ih.copy_(t(p["f_udt"]["bi"]))
        cell.bias_hh.copy_(t(p["f_udt"]["bh"]))
    h = t(h0)
    for _ in range(2):
        inputs = torch.cat([t(x), h], -1)
        v = F.linear(inputs, t(p["f_val"]["w"]).T, t(p["f_val"]["b"]))
        s = F.linear(inputs, t(p["f_sign"]["w"]).T, t(p["f_sign"]["b"]))
        q = F.linear(inputs, t(p["f_que"]["w"]).T, t(p["f_que"]["b"]))
        c = torch.zeros(A, 6)
        for d in range(A):
            srcs = np.where(adj[:, d])[0]
            if len(srcs):
                scores = (s[srcs] * q[d]).sum(-1) / 4
                alpha = torch.softmax(scores, 0)
                c[d] = (alpha.unsqueeze(-1) * v[srcs]).sum(0)
        h = cell(torch.cat([t(x), c], -1), h)
    np.testing.assert_allclose(np.asarray(mine), h.detach().numpy(), atol=ATOL)


def test_edgeconv_matches_oracle():
    args = make_args(hidden_size=6, msg_size=5, n_rounds=1)
    comm = EdgeConv(args)
    p = comm.init(jax.random.PRNGKey(10))
    rng = np.random.default_rng(10)
    A = 4
    x = rng.normal(size=(A, 6)).astype(np.float32)
    h0 = rng.normal(size=(A, 6)).astype(np.float32)
    adj = rng.random((A, A)) > 0.4
    np.fill_diagonal(adj, True)

    mine = comm.apply(p, jnp.asarray(adj), jnp.asarray(x), jnp.asarray(h0))

    cell = torch.nn.GRUCell(6 + 5, 6)
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["f_udt"]["wi"]).T)
        cell.weight_hh.copy_(t(p["f_udt"]["wh"]).T)
        cell.bias_ih.copy_(t(p["f_udt"]["bi"]))
        cell.bias_hh.copy_(t(p["f_udt"]["bh"]))
    c = torch.zeros(A, 5)
    for d in range(A):
        srcs = np.where(adj[:, d])[0]
        if len(srcs):
            feats = torch.cat([torch.cat([t(x[s]), t(h0[s]), t(x[d]), t(h0[d])]).unsqueeze(0)
                               for s in srcs])
            msgs = F.linear(feats, t(p["f_msg"]["w"]).T, t(p["f_msg"]["b"]))
            c[d] = msgs.mean(0)
    ref = cell(torch.cat([t(x), c], -1), t(h0))
    np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(), atol=ATOL)


def test_discrete_comm_bits_and_shapes():
    args = make_args(hidden_size=8, msg_size=4)
    comm = DiscreteComm(args)
    p = comm.init(jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    A = 4
    x = jnp.asarray(rng.normal(size=(A, 8)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(A, 8)).astype(np.float32))
    adj = rng.random((A, A)) > 0.5
    np.fill_diagonal(adj, True)
    out = comm.apply(p, jnp.asarray(adj), x, h, jax.random.PRNGKey(99))
    assert out.shape == (A, 8)
    assert np.isfinite(np.asarray(out)).all()
    # Gradient flows through the straight-through estimator.
    g = jax.grad(lambda pp: comm.apply(pp, jnp.asarray(adj), x, h,
                                       jax.random.PRNGKey(99)).sum())(p)
    flat = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in flat)


# --------------------------------------------------------------------------- #
# Heads


def test_dueling_matches_formula():
    layer = DuelingLayer(6, 5)
    p = layer.init(jax.random.PRNGKey(12))
    x = np.random.default_rng(12).normal(size=(7, 6)).astype(np.float32)
    mine = layer.apply(p, jnp.asarray(x))
    vals = F.linear(t(x), t(p["v"]["w"]).T, t(p["v"]["b"]))
    advs = F.linear(t(x), t(p["adv"]["w"]).T, t(p["adv"]["b"]))
    ref = vals + (advs - advs.mean(-1, keepdim=True))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=ATOL)


def test_qmixer_matches_oracle():
    args = make_args(embed_dim=8)
    mixer = QMixer(state_shape=10, n_agents=3, args=args)
    p = mixer.init(jax.random.PRNGKey(13))
    rng = np.random.default_rng(13)
    T, B = 4, 2
    qs = rng.normal(size=(T, B, 3)).astype(np.float32)
    states = rng.normal(size=(T, B, 10)).astype(np.float32)

    mine = mixer.apply(p, jnp.asarray(qs), jnp.asarray(states))

    s = t(states).reshape(-1, 10)
    q = t(qs).reshape(-1, 1, 3)
    w1 = torch.abs(F.linear(s, t(p["hyper_w1"]["w"]).T, t(p["hyper_w1"]["b"]))).view(-1, 3, 8)
    b1 = F.linear(s, t(p["hyper_b1"]["w"]).T, t(p["hyper_b1"]["b"])).view(-1, 1, 8)
    hidden = F.elu(torch.bmm(q, w1) + b1)
    wf = torch.abs(F.linear(s, t(p["hyper_wf"]["w"]).T, t(p["hyper_wf"]["b"]))).view(-1, 8, 1)
    v = F.linear(torch.relu(F.linear(s, t(p["v1"]["w"]).T, t(p["v1"]["b"]))),
                 t(p["v2"]["w"]).T, t(p["v2"]["b"])).view(-1, 1, 1)
    ref = (torch.bmm(hidden, wf) + v).view(T, B, 1)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=ATOL)


def test_qmixer_monotonic_in_agent_qs():
    args = make_args(embed_dim=8)
    mixer = QMixer(state_shape=6, n_agents=4, args=args)
    p = mixer.init(jax.random.PRNGKey(14))
    rng = np.random.default_rng(14)
    qs = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    states = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
    g = jax.grad(lambda q: mixer.apply(p, q, states).sum())(qs)
    assert (np.asarray(g) >= 0).all()  # abs() hypernetwork weights => monotone
