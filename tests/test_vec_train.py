"""Vectorized on-device training path: collection layout + end-to-end run."""

import numpy as np
import pytest
from types import SimpleNamespace as SN

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect
from uav_bs_ctrl_tpu.algos.madrqn.vec_run import train_vectorized
from uav_bs_ctrl_tpu.envs import jax_env


def test_layout_pool_matches_map_distribution():
    pool_ubs, pool_gts = collect.make_layout_pool("debug", 3, seed=0)
    # Debug map pins exact positions.
    np.testing.assert_array_equal(np.asarray(pool_ubs[0]),
                                  100 * np.array([[3, 3], [8, 2], [8, 9]]))
    assert pool_ubs.shape == (3, 3, 2)
    assert pool_gts.shape == (3, 4, 2)


def test_collect_chunk_layout_and_consistency():
    from uav_bs_ctrl_tpu.models.agents import GnnAgent

    params = jax_env.make_params("debug")
    T, B, A = params.episode_limit, 4, params.n_ubs
    args = SN(hidden_size=16, n_layers=1, n_heads=4, msg_size=8, key_size=4,
              n_rounds=1, dueling=False, c=None, o="gnn")
    agent = GnnAgent(dict(agent=2, gt=4, ubs=2), params.n_actions, args)
    p = {"net": agent.init(jax.random.PRNGKey(0))}

    pool = collect.make_layout_pool("debug", 2, seed=0)
    states = collect.reset_worlds(params, pool, jax.random.PRNGKey(1), B)
    h0 = jnp.zeros((B, A, 16))

    def apply_fn(pp, obs, h, k):
        return agent.apply(pp["net"], obs, h, k)

    chunk, states_f, stats = collect.collect_chunk(
        params, apply_fn, p, states, h0, T, jax.random.PRNGKey(2), jnp.float32(0.5))

    assert chunk["obs"]["agent"].shape == (B, T + 1, A, 2)
    assert chunk["obs"]["gt"].shape == (B, T + 1, A, params.n_gts, 5)
    assert chunk["h"].shape == (B, 2, A, 16)
    assert chunk["act"].shape == (B, T, A)
    assert chunk["rew"].shape == (B, T, A)
    assert chunk["state"].shape[1] == T + 1
    assert int(states_f.t[0]) == T
    # EpRet must equal the mean-reward sum along the chunk.
    np.testing.assert_allclose(np.asarray(stats["EpRet"]),
                               np.asarray(chunk["rew"]).mean(-1).sum(-1), rtol=1e-5)
    # h at index 0 is the initial zero state.
    np.testing.assert_allclose(np.asarray(chunk["h"][:, 0]), 0.0)
    # Quirk 4: stored done is identically zero (timeout-only termination with
    # bad-mask masking) — targets always bootstrap, matching the host cache().
    np.testing.assert_array_equal(np.asarray(chunk["done"]), 0.0)
    assert int(states_f.t[0]) == T  # ...even though the episode did time out.


@pytest.mark.parametrize("kw", [
    dict(o="gnn", c="tarmac"),
    dict(o="mlp", c=None, double_q=True),
])
def test_train_vectorized_end_to_end(tmp_path, kw):
    learner = train_vectorized(
        "debug", seed=0,
        train_kwargs=dict(device="cpu", hidden_size=16, msg_size=8, batch_size=4,
                          replay_size=64, steps_per_epoch=80, epochs=2,
                          decay_steps=100, save_freq=10, **kw),
        logger_kwargs=dict(output_dir=str(tmp_path / "vec"), exp_name="vec"),
        n_worlds=2, n_layouts=4, updates_per_chunk=2)
    import os.path as osp
    assert osp.exists(str(tmp_path / "vec" / "progress.txt"))
    with open(str(tmp_path / "vec" / "progress.txt")) as f:
        header = f.readline().split("\t")
    header = [h.strip() for h in header]
    assert "EnvStepsPerSec" in header
    assert "AverageTestEpRet" in header  # on-device eval episodes are logged
    assert len(learner.buffer) > 0


def test_evaluate_policy_on_device():
    """Greedy on-device eval returns per-episode stats with no NaNs."""
    from uav_bs_ctrl_tpu.models.agents import GnnAgent

    params = jax_env.make_params("debug")
    args = SN(hidden_size=16, n_layers=1, n_heads=4, msg_size=8, key_size=4,
              n_rounds=1, dueling=False, c=None, o="gnn")
    agent = GnnAgent(dict(agent=2, gt=4, ubs=2), params.n_actions, args)
    p = {"net": agent.init(jax.random.PRNGKey(0))}
    pool = collect.make_layout_pool("debug", 2, seed=0)

    def apply_fn(pp, obs, h, k):
        return agent.apply(pp["net"], obs, h, k)

    stats = collect.evaluate_policy(params, apply_fn, p, pool, 16,
                                    jax.random.PRNGKey(3), n_episodes=4)
    assert set(stats) == {"TestEpRet", "TestFairIdx", "TestAvgGlobalUtility",
                          "TestTotalThroughput", "TestProbCollision"}
    for v in stats.values():
        v = np.asarray(v)
        assert v.shape == (4,)
        assert np.isfinite(v).all()
    # Greedy (eps=0) differs from a fully-random policy only via Q argmax;
    # fairness stays in [0, 1].
    assert (np.asarray(stats["TestFairIdx"]) >= 0).all()
    assert (np.asarray(stats["TestFairIdx"]) <= 1 + 1e-6).all()


def test_vec_checkpoint_loads_in_classic_learner(tmp_path):
    """Checkpoints from the vectorized path load into the classic learner."""
    import os.path as osp
    from types import SimpleNamespace as SN
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
    from uav_bs_ctrl_tpu.algos.madrqn.wrappers import make_env
    from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv

    kw = dict(device="cpu", o="gnn", c="tarmac", hidden_size=16, msg_size=8,
              batch_size=4, replay_size=64, steps_per_epoch=40, epochs=1,
              decay_steps=100, save_freq=1)
    learner = train_vectorized(
        "debug", seed=0, train_kwargs=kw,
        logger_kwargs=dict(output_dir=str(tmp_path / "v"), exp_name="v"),
        n_worlds=2, n_layouts=2, updates_per_chunk=1)

    ckpt = osp.join(str(tmp_path / "v"), "checkpoint_epoch1.pt")
    assert osp.exists(ckpt)

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(kw, max_seq_len=None)
    args = check_args_sanity(SN(**cfg))
    np.random.seed(0)
    env = make_env(lambda: MultiUbsCoverageEnv(map_id="debug", record=False,
                                               use_native=False), args)
    classic = MultiAgentQLearner(env.get_env_info(), args, seed=9)
    stamp = classic.load_checkpoint(ckpt)
    assert "epoch" in stamp
    # Greedy acting works with the loaded params.
    (o, _), h = env.reset(), classic.init_hidden()
    a, h2 = classic.act(o, h, 0.0)
    assert len(a) == env.n_agents
