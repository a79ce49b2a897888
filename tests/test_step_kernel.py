"""Exactness tests for the fused recurrent-step megakernel (ops/step_kernels).

The kernel must reproduce the XLA step — TarMAC comm (reference
``gnn_agents.py:232-271``) + GRU + (dueling) head (``dueling.py:13-16``) — in
both forward activations and gradients (custom VJP), including masked
topologies (partial adjacency, zero-in-edge destinations) and padded world
counts.  Runs in interpret mode on CPU; the same code path compiles on TPU.
"""

import numpy as np
import pytest
from types import SimpleNamespace as SN

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.ops import step_kernels as sk


def _make_case(rng, w, a, hidden, msg, key_size, n_act, adj_mode="random"):
    x = jnp.asarray(rng.normal(size=(w * a, hidden)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(w * a, hidden)).astype(np.float32))
    if adj_mode == "full":
        adjf = np.ones((w * a, a), np.float32)
    else:
        adjf = (rng.random((w * a, a)) > 0.4).astype(np.float32)
        # Self-loops (always present in the real talk graph) ...
        for i in range(w * a):
            adjf[i, i % a] = 1.0
        # ... except one destination column with ZERO in-edges (world 0,
        # agent 1) to pin the empty-mailbox -> zero-message semantics.
        if a > 1:
            adjf[0 * a:(0 + 1) * a, 1] = 0.0
    adjf = jnp.asarray(adjf)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    u = lambda k, shape, scale=0.3: scale * jax.random.normal(k, shape)
    weights = dict(
        wv=u(ks[0], (2 * hidden, msg)), bv=u(ks[0], (msg,)),
        ws=u(ks[1], (2 * hidden, key_size)), bs=u(ks[1], (key_size,)),
        wq=u(ks[2], (2 * hidden, key_size)), bq=u(ks[2], (key_size,)),
        wi=u(ks[3], (hidden + msg, 3 * hidden)), wh=u(ks[4], (hidden, 3 * hidden)),
        bi=u(ks[3], (3 * hidden,)), bh=u(ks[4], (3 * hidden,)),
        wo=u(ks[5], (hidden, n_act)), bo=u(ks[5], (n_act,)),
        wvh=u(ks[6], (hidden, 1)), bvh=u(ks[6], (1,)),
    )
    return x, h, adjf, weights


ORDER = ("wv", "bv", "ws", "bs", "wq", "bq", "wi", "wh", "bi", "bh",
         "wo", "bo", "wvh", "bvh")


@pytest.mark.parametrize("dueling", [True, False])
@pytest.mark.parametrize("adj_mode", ["random", "full"])
def test_step_forward_matches_reference(dueling, adj_mode):
    rng = np.random.default_rng(0)
    w, a, hidden, msg, key_size, n_act = 5, 4, 32, 16, 8, 7
    x, h, adjf, wt = _make_case(rng, w, a, hidden, msg, key_size, n_act, adj_mode)
    args = [wt[k] for k in ORDER]

    q_ref, h_ref = sk.tarmac_step_reference(x, h, adjf, *args, a=a,
                                            key_size=key_size, dueling=dueling)
    q, h2 = sk.tarmac_step(x, h, adjf, *args, a, key_size, dueling)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref),
                               atol=2e-5, rtol=1e-5)


def test_step_forward_pads_partial_tile():
    """World counts that don't fill a tile run padded, results unchanged."""
    rng = np.random.default_rng(1)
    w, a, hidden, msg, key_size, n_act = 3, 8, 32, 16, 8, 5
    x, h, adjf, wt = _make_case(rng, w, a, hidden, msg, key_size, n_act)
    args = [wt[k] for k in ORDER]
    q_ref, h_ref = sk.tarmac_step_reference(x, h, adjf, *args, a=a,
                                            key_size=key_size, dueling=True)
    # Force a tile far larger than the world count.
    q, h2 = sk.tarmac_step(x, h, adjf, *args, a, key_size, True,
                           tile_worlds=16)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("dueling", [True, False])
def test_step_gradients_match_reference(dueling):
    """Custom-VJP gradients == autodiff through the XLA twin, including the
    stop_gradient(h) semantics of the TarMAC value/signature/query inputs."""
    rng = np.random.default_rng(2)
    w, a, hidden, msg, key_size, n_act = 4, 4, 32, 16, 8, 7
    x, h, adjf, wt = _make_case(rng, w, a, hidden, msg, key_size, n_act)
    args = [wt[k] for k in ORDER]

    def loss_pallas(x, h, *ws):
        q, h2 = sk.tarmac_step_train(x, h, adjf, *ws, a, key_size, dueling)
        return jnp.sum(jnp.sin(q)) + jnp.sum(jnp.cos(h2))

    def loss_ref(x, h, *ws):
        q, h2 = sk.tarmac_step_reference(x, h, adjf, *ws, a=a,
                                         key_size=key_size, dueling=dueling)
        return jnp.sum(jnp.sin(q)) + jnp.sum(jnp.cos(h2))

    g_pal = jax.grad(loss_pallas, argnums=tuple(range(2 + len(args))))(x, h, *args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(2 + len(args))))(x, h, *args)
    names = ("x", "h") + ORDER
    for name, gp, gr in zip(names, g_pal, g_ref):
        if not dueling and name in ("wvh", "bvh"):
            continue  # unused by the reference twin when not dueling
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_agent_step_backend_matches_xla():
    """GnnAgent with step_backend='pallas' == 'xla' through apply() and grads."""
    from uav_bs_ctrl_tpu.models.agents import GnnAgent

    base = dict(hidden_size=32, n_layers=2, n_heads=4, msg_size=16, key_size=8,
                n_rounds=1, dueling=True, c="tarmac", o="gnn")
    A, M, K = 4, 6, 3
    obs_shape = dict(agent=2, gt=4, ubs=2)
    rng = np.random.default_rng(3)
    B = 3
    obs = {
        "agent": jnp.asarray(rng.normal(size=(B, A, 2)).astype(np.float32)),
        "gt": jnp.asarray(np.concatenate(
            [(rng.random((B, A, M, 1)) > 0.4).astype(np.float32),
             rng.normal(size=(B, A, M, 4)).astype(np.float32)], -1)),
        "ubs": jnp.asarray(np.concatenate(
            [(rng.random((B, A, K, 1)) > 0.4).astype(np.float32),
             rng.normal(size=(B, A, K, 2)).astype(np.float32)], -1)),
        "adj": jnp.asarray(rng.random((B, A, A)) > 0.3),
    }
    h = jnp.asarray(rng.normal(size=(B, A, 32)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    agent_x = GnnAgent(obs_shape, 5, SN(**base, step_backend="xla"))
    agent_p = GnnAgent(obs_shape, 5, SN(**base, step_backend="pallas"))
    params = agent_x.init(jax.random.PRNGKey(7))

    qx, hx = agent_x.apply(params, obs, h, key)
    qp, hp = agent_p.apply(params, obs, h, key)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qx),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx),
                               atol=2e-5, rtol=1e-5)

    def loss(agent):
        def f(p):
            q, h2 = agent.apply(p, obs, h, key)
            return jnp.mean(jnp.square(q)) + jnp.mean(jnp.square(h2))
        return f

    gx = jax.grad(loss(agent_x))(params)
    gp = jax.grad(loss(agent_p))(params)
    jax.tree_util.tree_map(
        lambda ga, gb: np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), atol=5e-5, rtol=1e-4),
        gx, gp)


def test_learner_update_step_backend_matches_xla():
    """Full scan-BPTT update with step_backend='pallas' reproduces the XLA
    learner's loss and updated params on the same batch."""
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner

    A, T = 4, 3
    nf_gt, nf_ubs = 5, 3
    M, K = 6, 3
    env_info = dict(obs_shape=dict(agent=2, gt=nf_gt - 1, ubs=nf_ubs - 1),
                    state_shape=12, n_actions=5, n_agents=A, episode_limit=T)

    def fill(learner, rng):
        for _ in range(learner.batch_size):
            for t in range(T):
                def obs():
                    return {
                        "agent": rng.normal(size=(A, 2)).astype(np.float32),
                        "gt": np.concatenate(
                            [(rng.random((A, M, 1)) > 0.4).astype(np.float32),
                             rng.normal(size=(A, M, nf_gt - 1)).astype(np.float32)], -1),
                        "ubs": np.concatenate(
                            [(rng.random((A, K, 1)) > 0.4).astype(np.float32),
                             rng.normal(size=(A, K, nf_ubs - 1)).astype(np.float32)], -1),
                        "adj": rng.random((A, A)) > 0.3,
                    }
                learner.cache(
                    obs=obs(), h=rng.normal(size=(A, 32)).astype(np.float32),
                    state=rng.normal(size=(12,)).astype(np.float32),
                    act=rng.integers(5, size=A), rew=rng.normal(size=A).astype(np.float32),
                    next_obs=obs(), next_h=rng.normal(size=(A, 32)).astype(np.float32),
                    next_state=rng.normal(size=(12,)).astype(np.float32),
                    done=float(t == T - 1), bad_mask=float(t == T - 1))

    def run(backend, bptt):
        from types import SimpleNamespace as SN2
        cfg = dict(DEFAULT_CONFIG)
        cfg.update(o="gnn", c="tarmac", hidden_size=32, msg_size=16, key_size=8,
                   batch_size=8, replay_size=50, max_seq_len=T, double_q=True,
                   dueling=True, step_backend=backend, bptt_encoder=bptt)
        args = check_args_sanity(SN2(**cfg))
        learner = MultiAgentQLearner(env_info, args, seed=5)
        fill(learner, np.random.default_rng(0))
        batch = learner.buffer.sample(learner.batch_size,
                                      rng=np.random.default_rng(2))
        dev_batch = learner._batch_to_device(batch)
        key = jax.random.PRNGKey(9)
        params, targets, opt_state, metrics = learner._update_jit(
            jax.tree_util.tree_map(jnp.asarray, learner.params),
            jax.tree_util.tree_map(jnp.asarray, learner.target_params),
            learner.opt_state, dev_batch, key, jnp.float32(1.0))
        return float(metrics["LossQ"]), params

    loss_x, params_x = run("xla", "per_step")
    for bptt in ("per_step", "hoisted"):
        loss_p, params_p = run("pallas", bptt)
        np.testing.assert_allclose(loss_p, loss_x, rtol=1e-5,
                                   err_msg=f"bptt={bptt}")
        for xa, xb in zip(jax.tree_util.tree_leaves(params_x),
                          jax.tree_util.tree_leaves(params_p)):
            np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                       atol=5e-5, rtol=1e-3)
