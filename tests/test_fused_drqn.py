"""Fused DRQN (exp1 fast path): episode slicing, training, driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect_subs
from uav_bs_ctrl_tpu.algos.drqn.fused import FusedDrqnTrainer
from uav_bs_ctrl_tpu.envs import jax_env_subs


def test_collect_episode_subs_slicing_invariants():
    """Sliced chunks must tile the episode exactly as per-step cache() would."""
    from types import SimpleNamespace as SN
    from uav_bs_ctrl_tpu.models.agents import RnnAgent

    T, L, B = 20, 5, 3
    params = jax_env_subs.make_params(n_grps=2, gts_per_grp=2, episode_limit=T)
    M = params.n_gts
    args = SN(hidden_size=8, n_layers=1, dueling=False)
    agent = RnnAgent(2 + M * 4, params.n_actions, args)
    p = {"net": agent.init(jax.random.PRNGKey(0))}

    def apply_fn(pp, obs, h, k):
        lead = obs["agent"].shape[:-1]
        flat = jnp.concatenate([obs["agent"], obs["gt"].reshape(lead + (-1,))], -1)
        return agent.apply(pp["net"], flat, h, k)

    pool = collect_subs.make_subs_layout_pool(2, seed=0, n_grps=2, gts_per_grp=2,
                                              episode_limit=T)
    states = collect_subs.reset_subs_worlds(params, pool, jax.random.PRNGKey(1), B)
    h0 = jnp.zeros((B, 1, 8))
    chunks, states_f, stats = collect_subs.collect_episode_subs(
        params, apply_fn, p, states, h0, T, L, jax.random.PRNGKey(2),
        jnp.float32(0.5))

    S = T // L
    assert chunks["obs"]["agent"].shape == (B * S, L + 1, 1, 2)
    assert chunks["obs"]["gt"].shape == (B * S, L + 1, 1, M, 4)
    assert chunks["h"].shape == (B * S, 2, 1, 8)
    assert chunks["act"].shape == (B * S, L, 1)
    assert chunks["rew"].shape == (B * S, L, 1)

    # Quirk 4: stored done identically zero, though the episode timed out.
    np.testing.assert_array_equal(np.asarray(chunks["done"]), 0.0)
    assert int(states_f.t[0]) == T

    obs_a = np.asarray(chunks["obs"]["agent"]).reshape(B, S, L + 1, 1, 2)
    h = np.asarray(chunks["h"]).reshape(B, S, 2, 1, 8)
    # Continuity: slice i's trailing next-obs == slice i+1's first obs.
    np.testing.assert_allclose(obs_a[:, :-1, -1], obs_a[:, 1:, 0], rtol=1e-6)
    # First slice starts from the zero hidden state; later slices don't.
    np.testing.assert_allclose(h[:, 0, 0], 0.0)
    assert np.abs(h[:, 1:, 0]).max() > 0
    # Per-world EpRet equals the reward sum across that world's slices.
    rew = np.asarray(chunks["rew"]).reshape(B, S, L)
    np.testing.assert_allclose(np.asarray(stats["EpRet"]), rew.sum((1, 2)), rtol=1e-5)


@pytest.mark.parametrize("agent", ["rnn", "gnn"])
def test_fused_drqn_trains(agent):
    trainer = FusedDrqnTrainer(
        env_kwargs=dict(n_grps=2, gts_per_grp=2, episode_limit=20),
        train_kwargs=dict(device="cpu", hidden_size=16, batch_size=4,
                          max_seq_len=5, agent=agent, replay_size=64),
        n_worlds=2, n_layouts=4, updates_per_iter=2, seed=0)
    assert trainer.chunks_per_iter == 8

    trainer.run_iteration(1.0, warmup=True)
    assert trainer._size == 8
    assert float(np.asarray(trainer.replay["done"]).sum()) == 0.0

    p0 = jax.tree_util.tree_map(np.asarray, trainer.learner.params)
    m = trainer.run_iteration(0.5)
    assert np.isfinite(m["LossQ"])
    changed = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p0, trainer.learner.params)
    assert max(jax.tree_util.tree_leaves(changed)) > 0

    stats = trainer.evaluate(n_episodes=3)
    assert np.isfinite(np.mean(stats["TestEpRet"]))


def test_run_fast_exp1_driver_end_to_end(tmp_path):
    import os.path as osp
    from run_fast import train_fast_exp1

    train_fast_exp1(dict(n_grps=2, gts_per_grp=2, episode_limit=20), seed=0,
                    train_overrides=dict(hidden_size=16, batch_size=4,
                                         max_seq_len=5, replay_size=64,
                                         steps_per_epoch=80, epochs=2,
                                         update_after=40, decay_steps=200,
                                         device="cpu"),
                    logger_kwargs=dict(output_dir=str(tmp_path / "e1"),
                                       exp_name="e1"),
                    n_worlds=2, n_layouts=2)
    progress = str(tmp_path / "e1" / "progress.txt")
    assert osp.exists(progress)
    with open(progress) as f:
        header = [h.strip() for h in f.readline().split("\t")]
        rows = f.readlines()
    assert "AverageTestEpRet" in header and "LossQ" in header
    assert len(rows) == 2
    assert osp.exists(str(tmp_path / "e1" / "checkpoint_epoch2.pt"))


@pytest.mark.parametrize("agent", ["rnn", "gnn"])
def test_fused_drqn_checkpoint_loads_in_classic_learner(tmp_path, agent):
    """Checkpoints from the fused exp1 path load into the classic DRQN learner.

    Mirrors the madrqn interchange test
    (``test_vec_train.py::test_vec_checkpoint_loads_in_classic_learner``) for
    the single-agent path: same checkpoint schema (reference
    ``algos/drqn/learner.py:128-150``), greedy acting works on the restored
    params in the host-loop driver's learner.
    """
    import os.path as osp
    from types import SimpleNamespace as SN
    from run_fast import train_fast_exp1
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity
    from uav_bs_ctrl_tpu.algos.drqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.drqn.learner import QLearner
    from uav_bs_ctrl_tpu.algos.drqn.wrappers import make_env
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv

    kw = dict(hidden_size=16, batch_size=4, max_seq_len=5, replay_size=64,
              steps_per_epoch=80, epochs=1, update_after=40, decay_steps=200,
              save_freq=1, device="cpu", agent=agent)
    env_kw = dict(n_grps=2, gts_per_grp=2, episode_limit=20)
    train_fast_exp1(env_kw, seed=0, train_overrides=kw,
                    logger_kwargs=dict(output_dir=str(tmp_path / "x"),
                                       exp_name="x"),
                    n_worlds=2, n_layouts=2)
    ckpt = osp.join(str(tmp_path / "x"), "checkpoint_epoch1.pt")
    assert osp.exists(ckpt)

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(kw)
    args = check_args_sanity(SN(**cfg))
    np.random.seed(0)
    env = make_env(lambda: SingleUbsCoverageEnv(record=False, **env_kw), args)
    classic = QLearner(env.get_env_info(), args, seed=9)
    stamp = classic.load_checkpoint(ckpt)
    assert stamp["epoch"] == 1
    # Greedy acting works with the loaded params.
    o, h = env.reset(), classic.init_hidden()
    a, h2 = classic.act(o, h, 0.0)
    assert 0 <= int(np.asarray(a).reshape(-1)[0]) < env.get_env_info()["n_actions"]


def test_run_fast_resume_appends(tmp_path):
    """--resume continues from the newest checkpoint and appends to the log."""
    import os.path as osp
    from run_fast import train_fast_exp1

    kw = dict(hidden_size=16, batch_size=4, max_seq_len=5, replay_size=64,
              steps_per_epoch=80, update_after=40, decay_steps=200,
              save_freq=1, device="cpu")
    lk = dict(output_dir=str(tmp_path / "r"), exp_name="r")
    env_kw = dict(n_grps=2, gts_per_grp=2, episode_limit=20)

    train_fast_exp1(env_kw, seed=0, train_overrides=dict(epochs=1, **kw),
                    logger_kwargs=lk, n_worlds=2, n_layouts=2)
    tr = train_fast_exp1(env_kw, seed=0, train_overrides=dict(epochs=3, **kw),
                         logger_kwargs=lk, n_worlds=2, n_layouts=2, resume=True)

    with open(str(tmp_path / "r" / "progress.txt")) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    header, rows = lines[0], lines[1:]
    assert header.startswith("Epoch")
    assert len(rows) == 3                      # 1 pre-kill + 2 resumed
    epochs = [int(float(r.split("\t")[0])) for r in rows]
    assert epochs == [1, 2, 3]
    assert osp.exists(str(tmp_path / "r" / "checkpoint_epoch3.pt"))
    # Resumed LR schedule picked up where it left off.
    assert tr.learner._epoch == 3
