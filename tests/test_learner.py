"""Learner tests: buffer semantics, jitted update math, end-to-end smoke."""

import numpy as np
import pytest
from types import SimpleNamespace as SN

from uav_bs_ctrl_tpu.algos.buffer import SequenceReplayBuffer
from uav_bs_ctrl_tpu.algos.common import check_args_sanity
from uav_bs_ctrl_tpu.algos.drqn.config import DEFAULT_CONFIG as DRQN_CONFIG
from uav_bs_ctrl_tpu.algos.drqn.learner import QLearner
from uav_bs_ctrl_tpu.algos.drqn.wrappers import make_env as make_drqn_env
from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG as MADRQN_CONFIG
from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
from uav_bs_ctrl_tpu.algos.madrqn.wrappers import make_env as make_madrqn_env
from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv
from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv


def madrqn_args(**kw):
    cfg = dict(MADRQN_CONFIG)
    cfg.update(hidden_size=32, msg_size=16, batch_size=4, replay_size=50, **kw)
    return check_args_sanity(SN(**cfg))


def drqn_args(**kw):
    cfg = dict(DRQN_CONFIG)
    cfg.update(hidden_size=32, batch_size=4, replay_size=50, max_seq_len=5, **kw)
    return check_args_sanity(SN(**cfg))


# --------------------------------------------------------------------------- #
# Buffer


def test_buffer_chunking_and_trailing_next():
    buf = SequenceReplayBuffer(capacity=10, max_seq_len=3)
    for t in range(7):
        buf.push(dict(
            obs={"agent": np.full((2, 4), t, np.float32)},
            h=np.full((2, 8), t, np.float32),
            act=np.array([t, t]), rew=np.array([0.5 * t], np.float32),
            done=np.float32(0.0),
            next_obs={"agent": np.full((2, 4), t + 1, np.float32)},
            next_h=np.full((2, 8), t + 1, np.float32),
        ))
    assert len(buf) == 2  # two complete chunks of 3; 7th step pending
    batch = buf.sample(2)
    assert batch["obs"]["agent"].shape == (2, 4, 2, 4)  # [B, T+1, A, d]
    assert batch["act"].shape == (2, 3, 2)
    assert batch["h"].shape == (2, 4, 2, 8)
    # Trailing obs equals next_obs of the chunk's last step.
    for b in range(2):
        start = batch["obs"]["agent"][b, 0, 0, 0]
        np.testing.assert_allclose(batch["obs"]["agent"][b, 3, 0, 0], start + 3)


def test_buffer_ring_overwrite():
    buf = SequenceReplayBuffer(capacity=2, max_seq_len=1)
    for t in range(5):
        buf.push(dict(obs={"x": np.array([float(t)])}, h=np.zeros(1, np.float32),
                      act=np.array([0]), rew=np.array([0.0], np.float32),
                      done=np.float32(0),
                      next_obs={"x": np.array([float(t + 1)])},
                      next_h=np.zeros(1, np.float32)))
    assert len(buf) == 2
    vals = {float(buf._storage["obs"]["x"][i, 0, 0]) for i in range(2)}
    assert vals == {3.0, 4.0}  # oldest chunks overwritten


# --------------------------------------------------------------------------- #
# End-to-end training smoke (madrqn variants)


def _run_madrqn_steps(args, n_steps=40, map_id="test"):
    np.random.seed(0)
    env = make_madrqn_env(lambda: MultiUbsCoverageEnv(map_id=map_id, record=False,
                                                      use_native=False), args)
    env_info = env.get_env_info()
    learner = MultiAgentQLearner(env_info, args, seed=0)

    (o, s), h = env.reset(), learner.init_hidden()
    losses = []
    for t in range(n_steps):
        a, h2 = learner.act(o, h, 0.5)
        o2, s2, r, d, info = env.step(a)
        learner.cache(o, h, s, a, r, o2, h2, s2, d, info["BadMask"])
        o, s, h = o2, s2, h2
        if d:
            (o, s), h = env.reset(), learner.init_hidden()
        if len(learner.buffer) >= args.batch_size and t % 5 == 0:
            losses.append(learner.update()["LossQ"])
    return learner, losses


@pytest.mark.parametrize("kw", [
    dict(o="mlp", c=None, max_seq_len=5),
    dict(o="mlp", c=None, max_seq_len=5, double_q=True, dueling=True),
    dict(o="mlp", c="tarmac", max_seq_len=5),
    dict(o="gnn", c=None, max_seq_len=5),
    dict(o="gnn", c="disc", max_seq_len=5, mixer=True, double_q=True),
    dict(o="gnn", c="commnet", max_seq_len=5),
])
def test_madrqn_variants_train(kw):
    learner, losses = _run_madrqn_steps(madrqn_args(**kw))
    assert len(losses) > 0
    assert all(np.isfinite(l) for l in losses)


def test_madrqn_update_changes_params_and_targets_move():
    import jax
    args = madrqn_args(o="mlp", c="base", max_seq_len=5)
    learner, _ = _run_madrqn_steps(args, n_steps=30)
    p0 = jax.tree_util.tree_map(np.asarray, learner.params)
    t0 = jax.tree_util.tree_map(np.asarray, learner.target_params)
    learner.update()
    p1 = learner.params
    t1 = learner.target_params
    changed = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                                     p0, p1)
    assert max(jax.tree_util.tree_leaves(changed)) > 0
    # Polyak: targets moved toward params, scaled by (1 - polyak).
    moved = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                                   t0, t1)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_bf16_mixed_precision_matches_f32_loss_and_trains():
    """compute_dtype='bfloat16' keeps f32 masters and tracks the f32 loss."""
    import jax
    import jax.numpy as jnp

    args = madrqn_args(o="gnn", c="tarmac", max_seq_len=5, double_q=True)
    learner, losses = _run_madrqn_steps(args, n_steps=30)
    assert all(np.isfinite(l) for l in losses)

    args_bf16 = madrqn_args(o="gnn", c="tarmac", max_seq_len=5, double_q=True,
                            compute_dtype="bfloat16")
    env = make_madrqn_env(lambda: MultiUbsCoverageEnv(map_id="test", record=False,
                                                      use_native=False), args_bf16)
    learner_bf16 = MultiAgentQLearner(env.get_env_info(), args_bf16, seed=0)

    # Same seed -> identical f32 master params; compare the loss on one batch.
    batch = learner._batch_to_device(learner.buffer.sample(args.batch_size))
    key = jax.random.PRNGKey(0)
    loss32, _ = learner._loss_fn(learner.params, learner.target_params, batch, key)
    loss16, _ = learner_bf16._loss_fn(learner.params, learner.target_params, batch, key)
    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) <= 0.05 * abs(float(loss32)) + 1e-3

    # A bf16 update keeps master params/optimizer state in f32.
    learner_bf16.buffer = learner.buffer
    learner_bf16.update()
    for leaf in jax.tree_util.tree_leaves(learner_bf16.params):
        assert leaf.dtype == jnp.float32


def test_checkpoint_roundtrip(tmp_path):
    import jax
    args = madrqn_args(o="mlp", c=None, max_seq_len=5, mixer=True)
    learner, _ = _run_madrqn_steps(args, n_steps=30)
    path = str(tmp_path / "checkpoint_epoch1.pt")
    learner.save_checkpoint(path, stamp=dict(epoch=1, t=30))

    env = make_madrqn_env(lambda: MultiUbsCoverageEnv(map_id="test", record=False,
                                                      use_native=False), args)
    learner2 = MultiAgentQLearner(env.get_env_info(), args, seed=123)
    stamp = learner2.load_checkpoint(path)
    assert stamp == dict(epoch=1, t=30)
    for a, b in zip(jax.tree_util.tree_leaves(learner.params),
                    jax.tree_util.tree_leaves(learner2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_share_reward_forced_by_mixer():
    args = madrqn_args(o="mlp", c=None, mixer=True)
    assert args.share_reward is True


# --------------------------------------------------------------------------- #
# DRQN


@pytest.mark.parametrize("agent", ["rnn", "gnn"])
def test_drqn_variants_train(agent):
    np.random.seed(0)
    args = drqn_args(agent=agent)
    env = make_drqn_env(lambda: SingleUbsCoverageEnv(n_grps=2, gts_per_grp=2,
                                                     episode_limit=20, record=False), args)
    learner = QLearner(env.get_env_info(), args, seed=0)

    o, h = env.reset(), learner.init_hidden()
    losses = []
    for t in range(40):
        a, h2 = learner.act(o, h, 0.5)
        o2, r, d, info = env.step(a[0])
        learner.cache(o, h, a[0], r, o2, h2, d, info["BadMask"])
        o, h = o2, h2
        if d:
            o, h = env.reset(), learner.init_hidden()
        if len(learner.buffer) >= args.batch_size and t % 5 == 0:
            losses.append(learner.update()["LossQ"])
    assert losses and all(np.isfinite(l) for l in losses)


def test_q_learning_converges_on_constant_reward():
    """Sanity: with gamma=0 and constant reward 1, Q-values approach 1."""
    np.random.seed(0)
    args = madrqn_args(o="mlp", c=None, max_seq_len=5, gamma=0.0, lr=5e-3,
                       anneal_lr=False, polyak=0.9)
    env = make_madrqn_env(lambda: MultiUbsCoverageEnv(map_id="test", record=False,
                                                      use_native=False), args)
    learner = MultiAgentQLearner(env.get_env_info(), args, seed=0)

    (o, s), h = env.reset(), learner.init_hidden()
    for t in range(60):
        a, h2 = learner.act(o, h, 1.0)  # fully random
        o2, s2, r, d, info = env.step(a)
        r = np.ones_like(np.asarray(r, np.float32))  # constant reward
        learner.cache(o, h, s, a, r, o2, h2, s2, d, info["BadMask"])
        o, s, h = o2, s2, h2
        if d:
            (o, s), h = env.reset(), learner.init_hidden()

    losses = [learner.update()["LossQ"] for _ in range(60)]
    assert losses[-1] < losses[0]
    assert losses[-1] < 0.05


def test_checkpoint_orbax_roundtrip(tmp_path):
    """Orbax directory backend round-trips the same pytrees as pickle."""
    from uav_bs_ctrl_tpu.utils import checkpoint as ckpt_io
    tree = {"epoch": 3, "t": 42,
            "model_state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                                 "nested": {"b": np.ones(4)}}}
    path = str(tmp_path / "ckpt_orbax")
    ckpt_io.save(path, tree)
    back = ckpt_io.load(path)
    assert back["epoch"] == 3 and back["t"] == 42
    np.testing.assert_array_equal(back["model_state_dict"]["w"],
                                  tree["model_state_dict"]["w"])
    np.testing.assert_array_equal(back["model_state_dict"]["nested"]["b"],
                                  tree["model_state_dict"]["nested"]["b"])


def test_hoisted_encoder_bptt_matches_per_step_apply():
    """The update's batched-over-time encoder + step-only scan must reproduce
    the straightforward per-step ``agent.apply`` unroll exactly (same math,
    same RNG threading) — the hoist is a scheduling change, not a model one."""
    import jax
    import jax.numpy as jnp

    cfg = dict(MADRQN_CONFIG)
    cfg.update(o="gnn", c="disc", mixer=True, double_q=True, dueling=True,
               hidden_size=16, msg_size=8, key_size=4, n_heads=4,
               batch_size=3, max_seq_len=5, bptt_encoder="hoisted")
    args = check_args_sanity(SN(**cfg))
    A, M, K = 3, 6, 2
    env_info = dict(obs_shape=dict(agent=2, gt=4, ubs=2), state_shape=A * 2 + M * 4,
                    n_actions=5, n_agents=A, episode_limit=5)
    learner = MultiAgentQLearner(env_info, args, seed=0)

    rng = np.random.default_rng(0)
    B, T = args.batch_size, 5
    obs = {
        "agent": rng.normal(size=(B, T + 1, A, 2)).astype(np.float32),
        "gt": np.concatenate([(rng.random((B, T + 1, A, M, 1)) > 0.4).astype(np.float32),
                              rng.normal(size=(B, T + 1, A, M, 4)).astype(np.float32)], -1),
        "ubs": np.concatenate([(rng.random((B, T + 1, A, K, 1)) > 0.4).astype(np.float32),
                               rng.normal(size=(B, T + 1, A, K, 2)).astype(np.float32)], -1),
        "adj": np.ones((B, T + 1, A, A), dtype=bool),
    }
    batch = dict(
        obs=obs,
        h=np.zeros((B, 2, A, 16), np.float32),
        state=rng.normal(size=(B, T + 1, env_info["state_shape"])).astype(np.float32),
        act=rng.integers(5, size=(B, T, A)),
        rew=rng.normal(size=(B, T, 1)).astype(np.float32),
        done=np.zeros((B, T), np.float32),
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    key = jax.random.PRNGKey(7)

    loss_new, _ = learner._loss_fn(learner.params, learner.target_params, batch, key)

    # Reference: per-step agent.apply unroll (the pre-hoist formulation).
    T_ = learner.max_seq_len
    obs_tm = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 1, 0), batch["obs"])
    acts = jnp.moveaxis(batch["act"], 1, 0).astype(jnp.int32)
    rews = jnp.moveaxis(batch["rew"], 1, 0)
    dones = jnp.moveaxis(batch["done"], 1, 0)[..., None]

    def per_step_unroll(p, h, k, obs_seq):
        def step(carry, obs_t):
            h, k = carry
            k, sub = jax.random.split(k)
            q, h = learner.agent.apply(p, obs_t, h, sub)
            return (h, k), q
        (_, _), qs = jax.lax.scan(step, (h, k), obs_seq)
        return qs

    key_pol, key_targ = jax.random.split(key)
    agent_out = per_step_unroll(learner.params["net"], batch["h"][:, 0], key_pol, obs_tm)
    obs_next = jax.tree_util.tree_map(lambda x: x[1:], obs_tm)
    target_out = per_step_unroll(learner.target_params["net"], batch["h"][:, 1],
                                 key_targ, obs_next)

    qvals = jnp.take_along_axis(agent_out[:T_], acts[..., None], axis=-1)[..., 0]
    next_acts = jnp.argmax(agent_out[1:], axis=-1)
    next_vals = jnp.take_along_axis(target_out, next_acts[..., None], axis=-1)[..., 0]
    states = jnp.moveaxis(batch["state"], 1, 0)
    qvals = learner.mixer.apply(learner.params["mixer"], qvals, states[:T_])
    next_vals = learner.mixer.apply(learner.target_params["mixer"], next_vals, states[1:])
    target_q = rews + args.gamma * (1.0 - dones) * next_vals
    loss_ref = jnp.mean(jnp.square(qvals - jnp.broadcast_to(target_q, qvals.shape)))

    np.testing.assert_allclose(float(loss_new), float(loss_ref), rtol=2e-5)


def test_merged_bptt_matches_per_step():
    """bptt_encoder='merged' (policy+target stacked in ONE scan) must equal
    the two-scan schedule in loss and gradients — a scheduling change only."""
    import jax
    import jax.numpy as jnp

    def mk(sched):
        cfg = dict(MADRQN_CONFIG)
        cfg.update(o="gnn", c="tarmac", mixer=True, double_q=True, dueling=True,
                   hidden_size=16, msg_size=8, key_size=4, n_heads=4,
                   batch_size=3, max_seq_len=5, bptt_encoder=sched)
        args = check_args_sanity(SN(**cfg))
        env_info = dict(obs_shape=dict(agent=2, gt=4, ubs=2),
                        state_shape=3 * 2 + 6 * 4, n_actions=5, n_agents=3,
                        episode_limit=5)
        return MultiAgentQLearner(env_info, args, seed=0)

    rng = np.random.default_rng(0)
    B, T, A, M, K = 3, 5, 3, 6, 2
    obs = {
        "agent": rng.normal(size=(B, T + 1, A, 2)).astype(np.float32),
        "gt": np.concatenate([(rng.random((B, T + 1, A, M, 1)) > 0.4).astype(np.float32),
                              rng.normal(size=(B, T + 1, A, M, 4)).astype(np.float32)], -1),
        "ubs": np.concatenate([(rng.random((B, T + 1, A, K, 1)) > 0.4).astype(np.float32),
                               rng.normal(size=(B, T + 1, A, K, 2)).astype(np.float32)], -1),
        "adj": np.ones((B, T + 1, A, A), dtype=bool),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, dict(
        obs=obs, h=np.zeros((B, 2, A, 16), np.float32),
        state=rng.normal(size=(B, T + 1, 3 * 2 + 6 * 4)).astype(np.float32),
        act=rng.integers(5, size=(B, T, A)),
        rew=rng.normal(size=(B, T, 1)).astype(np.float32),
        done=np.zeros((B, T), np.float32)))
    key = jax.random.PRNGKey(9)

    lp, lm = mk("per_step"), mk("merged")
    v1 = float(lp._loss_fn(lp.params, lp.target_params, batch, key)[0])
    v2 = float(lm._loss_fn(lm.params, lm.target_params, batch, key)[0])
    np.testing.assert_allclose(v2, v1, rtol=1e-5)
    g1 = jax.grad(lambda p: lp._loss_fn(p, lp.target_params, batch, key)[0])(lp.params)
    g2 = jax.grad(lambda p: lm._loss_fn(p, lm.target_params, batch, key)[0])(lm.params)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4), g1, g2)
