"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded training step compiles and executes with real
('dp','mp') shardings, that dp-sharded updates produce the same math as
single-device updates, and that the driver-facing ``dryrun_multichip`` runs.
"""

import numpy as np
import pytest
from types import SimpleNamespace as SN

import jax

from uav_bs_ctrl_tpu.algos.common import check_args_sanity
from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
from uav_bs_ctrl_tpu.algos.madrqn.wrappers import make_env
from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv
from uav_bs_ctrl_tpu.parallel import make_mesh, distribute_learner, shard_params_spec


def _args(**kw):
    cfg = dict(DEFAULT_CONFIG)
    cfg.update(hidden_size=32, msg_size=16, batch_size=8, replay_size=50,
               max_seq_len=5, **kw)
    return check_args_sanity(SN(**cfg))


def _fill(learner, env, n_steps=50):
    (o, s), h = env.reset(), learner.init_hidden()
    for t in range(n_steps):
        a, h2 = learner.act(o, h, 1.0)
        o2, s2, r, d, info = env.step(a)
        learner.cache(o, h, s, a, r, o2, h2, s2, d, info["BadMask"])
        o, s, h = o2, s2, h2
        if d:
            (o, s), h = env.reset(), learner.init_hidden()


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mp", [1, 2])
def test_sharded_update_runs(mp):
    np.random.seed(0)
    args = _args(o="mlp", c="tarmac")
    env = make_env(lambda: MultiUbsCoverageEnv(map_id="debug", record=False,
                                               use_native=False), args)
    learner = MultiAgentQLearner(env.get_env_info(), args, seed=0)
    _fill(learner, env)

    mesh = make_mesh(8, mp=mp)
    distribute_learner(learner, mesh)
    with mesh:
        m1 = learner.update()
        m2 = learner.update()
    assert np.isfinite(m1["LossQ"]) and np.isfinite(m2["LossQ"])


def test_dp_update_matches_single_device():
    """The dp-sharded update must reproduce single-device math exactly."""
    np.random.seed(0)
    args = _args(o="mlp", c=None, double_q=True)
    env = make_env(lambda: MultiUbsCoverageEnv(map_id="debug", record=False,
                                               use_native=False), args)

    learner_a = MultiAgentQLearner(env.get_env_info(), args, seed=7)
    _fill(learner_a, env)
    batch = learner_a.buffer.sample(args.batch_size, rng=np.random.default_rng(0))

    np.random.seed(0)
    env2 = make_env(lambda: MultiUbsCoverageEnv(map_id="debug", record=False,
                                                use_native=False), args)
    learner_b = MultiAgentQLearner(env2.get_env_info(), args, seed=7)
    mesh = make_mesh(8, mp=1)
    distribute_learner(learner_b, mesh)

    import jax.numpy as jnp
    key = jax.random.PRNGKey(3)

    def run(learner, in_mesh=None):
        dev_batch = learner._batch_to_device(batch)
        params, targets, opt_state, metrics = learner._update_jit(
            jax.tree_util.tree_map(jnp.asarray, learner.params),
            jax.tree_util.tree_map(jnp.asarray, learner.target_params),
            learner.opt_state, dev_batch, key, jnp.float32(1.0))
        return metrics["LossQ"], params

    loss_a, params_a = run(learner_a)
    with mesh:
        loss_b, params_b = run(learner_b)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for xa, xb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-5)


def test_param_sharding_rule():
    params = {"w": np.zeros((16, 64)), "b": np.zeros((7,)), "s": np.float32(1.0)}
    mesh = make_mesh(8, mp=2)
    spec = shard_params_spec(params, mesh)
    assert spec["w"] == jax.sharding.PartitionSpec(None, "mp")
    assert spec["b"] == jax.sharding.PartitionSpec()   # 7 not divisible by 2


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_gatv2_graph_parallel_matches_dense():
    """Edge-partitioned (GT-slot-sharded) GATv2 == dense single-device math."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from uav_bs_ctrl_tpu.models.encoders import gatv2, gatv2_init
    from uav_bs_ctrl_tpu.parallel.graph_parallel import gatv2_graph_parallel

    rng = np.random.default_rng(0)
    N, M, H, F = 16, 64, 4, 8
    d_src, d_dst = 5, 3
    p = gatv2_init(jax.random.PRNGKey(0), d_src, d_dst, H, F)
    x_src = jnp.asarray(rng.normal(size=(N, M, d_src)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(size=(N, d_dst)).astype(np.float32))
    mask = jnp.asarray(rng.random((N, M)) > 0.4)
    mask = mask.at[2].set(False)  # all-masked destination

    dense = gatv2(p, x_src, x_dst, mask, H)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("gp",))
    sharded = gatv2_graph_parallel(p, x_src, x_dst, mask, H, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_dist_statistics_combine_matches_concat():
    """Two simulated hosts' stat rows must reproduce np stats of the concat.

    Guards the global-mean-residual semantics of the reference
    (utils/mpi_tools.py:78-98): round-1 code accumulated residuals around each
    host's LOCAL mean, which understates the variance whenever host means
    differ.
    """
    from uav_bs_ctrl_tpu.parallel.dist import combine_host_stats, local_stat_row

    rng = np.random.default_rng(42)
    host_a = rng.normal(loc=0.0, scale=1.0, size=37)
    host_b = rng.normal(loc=5.0, scale=2.0, size=61)  # very different mean
    both = np.concatenate([host_a, host_b])

    rows = np.asarray([local_stat_row(host_a), local_stat_row(host_b)])
    mean, std, lo, hi = combine_host_stats(rows, with_min_and_max=True)

    np.testing.assert_allclose(mean, both.mean(), rtol=1e-12)
    np.testing.assert_allclose(std, both.std(), rtol=1e-9)
    np.testing.assert_allclose(lo, both.min())
    np.testing.assert_allclose(hi, both.max())

    # The local-mean-residual bug would have produced a much smaller std.
    local_resid = np.sum((host_a - host_a.mean()) ** 2) + np.sum((host_b - host_b.mean()) ** 2)
    buggy_std = np.sqrt(local_resid / both.size)
    assert std > buggy_std * 1.2


def test_graph_parallel_training_step_matches_dense():
    """FULL training step with the GT-slot axis edge-partitioned over 'gp'.

    A learner configured with gat_backend='graph_parallel' and distributed
    over a ('dp','mp','gp')=(1,1,8) mesh must reproduce the unsharded dense
    learner's update (loss + params) on the same batch — the shard_map path
    (parallel/graph_parallel.py) runs INSIDE the differentiated scan-BPTT
    update, not just in a standalone forward.
    """
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.parallel.graph_parallel import set_graph_parallel_mesh

    A, M, K = 4, 64, 3              # M divisible by gp=8
    nf_gt, nf_ubs = 5, 3
    T = 3
    env_info = dict(obs_shape=dict(agent=2, gt=nf_gt - 1, ubs=nf_ubs - 1),
                    state_shape=A * 2 + M * 4, n_actions=5, n_agents=A,
                    episode_limit=T)

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
                        "adj": np.ones((A, A), dtype=bool),
                    }
                learner.cache(
                    obs=obs(), h=rng.normal(size=(A, 32)).astype(np.float32),
                    state=rng.normal(size=(env_info["state_shape"],)).astype(np.float32),
                    act=rng.integers(5, size=A), rew=rng.normal(size=A).astype(np.float32),
                    next_obs=obs(), next_h=rng.normal(size=(A, 32)).astype(np.float32),
                    next_state=rng.normal(size=(env_info["state_shape"],)).astype(np.float32),
                    done=float(t == T - 1), bad_mask=float(t == T - 1))

    def build(backend):
        args = _args(o="gnn", c="tarmac", double_q=True, gat_backend=backend)
        args.max_seq_len = T
        learner = MultiAgentQLearner(env_info, args, seed=5)
        fill(learner, np.random.default_rng(0))
        return learner

    import jax.random
    key = jax.random.PRNGKey(9)

    def run(learner):
        batch = learner.buffer.sample(learner.batch_size,
                                      rng=np.random.default_rng(2))
        dev_batch = learner._batch_to_device(batch)
        params, targets, opt_state, metrics = learner._update_jit(
            jax.tree_util.tree_map(jnp.asarray, learner.params),
            jax.tree_util.tree_map(jnp.asarray, learner.target_params),
            learner.opt_state, dev_batch, key, jnp.float32(1.0))
        return float(metrics["LossQ"]), params

    loss_dense, params_dense = run(build("dense"))

    mesh = make_mesh(8, mp=1, gp=8)
    try:
        learner_gp = build("graph_parallel")
        distribute_learner(learner_gp, mesh, graph_parallel=True)
        with mesh:
            loss_gp, params_gp = run(learner_gp)
    finally:
        set_graph_parallel_mesh(None)

    np.testing.assert_allclose(loss_gp, loss_dense, rtol=1e-5)
    for xa, xb in zip(jax.tree_util.tree_leaves(params_dense),
                      jax.tree_util.tree_leaves(params_gp)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   atol=5e-5, rtol=1e-3)


def test_graph_parallel_pads_nondivisible_slots():
    """Non-divisible slot counts run DISTRIBUTED via masked padding (exact).

    Round-3 behavior (silent-ish dense fallback for e.g. the 3-slot 'near'
    relation) is gone: the slot axis pads to the next multiple of the gp axis
    with mask=False slots, which contribute exactly nothing to the masked
    softmax, so the result matches dense bit-for-bit up to reduction order —
    and NO fallback warning fires.
    """
    import warnings

    import jax.numpy as jnp
    from jax.sharding import Mesh
    from uav_bs_ctrl_tpu.models import encoders
    from uav_bs_ctrl_tpu.parallel.graph_parallel import set_graph_parallel_mesh

    rng = np.random.default_rng(3)
    N, M, H, F = 6, 7, 4, 8         # 7 slots: NOT divisible by the 8-way axis
    p = encoders.gatv2_init(jax.random.PRNGKey(0), 5, 3, H, F)
    x_src = jnp.asarray(rng.normal(size=(N, M, 5)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((N, M)) > 0.4)
    mask = mask.at[1].set(False)    # all-masked destination

    dense = encoders.gatv2(p, x_src, x_dst, mask, H)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("gp",))
    set_graph_parallel_mesh(mesh)
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = encoders.gatv2(p, x_src, x_dst, mask, H, backend="graph_parallel")
        assert not [x for x in w if "fell back" in str(x.message)]
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=2e-5, rtol=1e-5)

        # The only remaining fallback cause: no registered mesh — still warns.
        set_graph_parallel_mesh(None)
        encoders._gp_fallback_warned.clear()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            encoders.gatv2(p, x_src, x_dst, mask, 4, backend="graph_parallel")
        msgs = [str(x.message) for x in w if x.category is RuntimeWarning]
        assert len(msgs) == 1 and "no mesh registered" in msgs[0]
    finally:
        set_graph_parallel_mesh(None)
        encoders._gp_fallback_warned.clear()


def test_tarmac_attention_graph_parallel_matches_dense():
    """Source-agent-partitioned talk attention == dense masked softmax path.

    Covers the padded case too (S=5 sources over an 8-way axis) and an
    all-masked destination column (no in-edges -> zero message).
    """
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from uav_bs_ctrl_tpu.ops.masked import masked_softmax
    from uav_bs_ctrl_tpu.parallel.graph_parallel import tarmac_attention_graph_parallel

    rng = np.random.default_rng(11)
    N, S, D, K, M = 4, 5, 5, 8, 16
    s = jnp.asarray(rng.normal(size=(N, S, K)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(N, D, K)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, S, M)).astype(np.float32))
    adj = jnp.asarray(rng.random((N, S, D)) > 0.3)
    adj = adj.at[0, :, 2].set(False)  # destination with zero in-edges

    scores = jnp.einsum("nsk,ndk->nsd", s, q) / K
    alpha = masked_softmax(scores, adj, axis=-2)
    dense = jnp.einsum("nsd,nsm->ndm", alpha, v)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("gp",))
    out = tarmac_attention_graph_parallel(s, q, v, adj, K, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_tarmac_comm_backend_training_step_matches_dense():
    """FULL training step with comm_backend='graph_parallel': the talk-graph
    attention runs source-partitioned through shard_map inside the
    differentiated scan-BPTT update and reproduces the dense learner."""
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.parallel.graph_parallel import set_graph_parallel_mesh

    A, T = 4, 3
    obs_dim = 10
    env_info = dict(obs_shape=obs_dim, state_shape=12, n_actions=5, n_agents=A,
                    episode_limit=T)

    def fill(learner, rng):
        for _ in range(learner.batch_size):
            for t in range(T):
                def obs():
                    return {"agent": rng.normal(size=(A, obs_dim)).astype(np.float32),
                            "adj": rng.random((A, A)) > 0.3}
                learner.cache(
                    obs=obs(), h=rng.normal(size=(A, 32)).astype(np.float32),
                    state=rng.normal(size=(12,)).astype(np.float32),
                    act=rng.integers(5, size=A), rew=rng.normal(size=A).astype(np.float32),
                    next_obs=obs(), next_h=rng.normal(size=(A, 32)).astype(np.float32),
                    next_state=rng.normal(size=(12,)).astype(np.float32),
                    done=float(t == T - 1), bad_mask=float(t == T - 1))

    def build(backend):
        args = _args(o="mlp", c="tarmac", double_q=True, comm_backend=backend)
        args.max_seq_len = T
        learner = MultiAgentQLearner(env_info, args, seed=5)
        fill(learner, np.random.default_rng(0))
        return learner

    key = jax.random.PRNGKey(9)

    def run(learner):
        batch = learner.buffer.sample(learner.batch_size,
                                      rng=np.random.default_rng(2))
        dev_batch = learner._batch_to_device(batch)
        params, targets, opt_state, metrics = learner._update_jit(
            jax.tree_util.tree_map(jnp.asarray, learner.params),
            jax.tree_util.tree_map(jnp.asarray, learner.target_params),
            learner.opt_state, dev_batch, key, jnp.float32(1.0))
        return float(metrics["LossQ"]), params

    loss_dense, params_dense = run(build("dense"))

    mesh = make_mesh(8, mp=1, gp=8)
    try:
        from uav_bs_ctrl_tpu.parallel.graph_parallel import set_graph_parallel_mesh
        set_graph_parallel_mesh(mesh, "gp")
        learner_gp = build("graph_parallel")
        distribute_learner(learner_gp, mesh, graph_parallel=True)
        with mesh:
            loss_gp, params_gp = run(learner_gp)
    finally:
        set_graph_parallel_mesh(None)

    np.testing.assert_allclose(loss_gp, loss_dense, rtol=1e-5)
    for xa, xb in zip(jax.tree_util.tree_leaves(params_dense),
                      jax.tree_util.tree_leaves(params_gp)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   atol=5e-5, rtol=1e-3)


def test_fused_trainer_dp_sharded_matches_single():
    """The FULL fused loop (collect -> ring write -> K updates) sharded over
    an 8-way 'dp' mesh reproduces the unsharded trainer exactly.

    Same seeds -> identical math; only the execution is SPMD-partitioned
    (worlds and replay chunks sharded, params replicated, gradient allreduce
    inserted by XLA).  Extends the multi-chip validation beyond the bare
    update to collection and the device replay ring.
    """
    from uav_bs_ctrl_tpu.algos.madrqn.fused import FusedMadrqnTrainer

    kw = dict(device="cpu", o="mlp", c="tarmac", hidden_size=16, msg_size=8,
              batch_size=8, replay_size=64, max_seq_len=None, double_q=True)

    def run(mesh):
        tr = FusedMadrqnTrainer("debug", train_kwargs=dict(kw), n_worlds=8,
                                capacity_chunks=16, n_layouts=4, seed=3,
                                mesh=mesh)
        tr.run_iteration(1.0, warmup=True)
        m1 = tr.run_iteration(0.7)
        m2 = tr.run_iteration(0.5)
        return (m1, m2), tr.learner.params

    (a1, a2), params_single = run(None)
    mesh = make_mesh(8, mp=1)
    (b1, b2), params_dp = run(mesh)

    np.testing.assert_allclose(b1["LossQ"], a1["LossQ"], rtol=1e-5)
    np.testing.assert_allclose(b2["LossQ"], a2["LossQ"], rtol=1e-5)
    np.testing.assert_allclose(b2["EpRet"], a2["EpRet"], rtol=1e-5)
    for xa, xb in zip(jax.tree_util.tree_leaves(params_single),
                      jax.tree_util.tree_leaves(params_dp)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   atol=2e-5, rtol=1e-3)
