"""On-device vectorized collection for the single-UBS env (exp1 fast path).

Single-agent analog of :mod:`uav_bs_ctrl_tpu.algos.collect`, with one extra
twist from the reference's drqn regime: ``max_seq_len`` (default 10,
reference ``algos/drqn/config.py:20``) is shorter than the 200-step episode,
so each collected episode is SLICED into ``episode_limit // max_seq_len``
replay chunks whose hidden-state pairs are taken at the slice boundaries —
exactly what the reference's per-step ``cache()`` into the chunking buffer
produces (reference ``algos/drqn/buffer.py:17-29``, SURVEY.md quirks 5-6).

Everything runs on device: ``vmap`` over B worlds, ``lax.scan`` over the
episode, slicing is a static gather.  Episodes end only by timeout, so the
stored ``done`` is identically zero (quirk 4; the bad-mask rule).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.envs import jax_env_subs


def make_subs_layout_pool(n_layouts, seed=0, **env_kwargs):
    """Pre-generate GT layouts with the NumPy env's own generator.

    The UBS always starts at the region center (reference
    ``envs/subs_cov/subs_cov.py:92-94``); only GT positions vary.
    Returns ``(pos_ubs [2], pos_gts [L, M, 2])`` device arrays.
    """
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv
    env = SingleUbsCoverageEnv(record=False, **env_kwargs)
    rng_state = np.random.get_state()
    np.random.seed(seed)
    gts = []
    for _ in range(n_layouts):
        env._set_position()
        gts.append(env.pos_gts.astype(np.float32).copy())
    np.random.set_state(rng_state)
    return jnp.asarray(env.pos_ubs, jnp.float32), jnp.asarray(np.stack(gts))


def reset_subs_worlds(params, pool, key, n_worlds):
    """Reset B single-UBS worlds from random pool layouts (on device)."""
    pos_ubs, pool_gts = pool
    k_pick, k_reset = jax.random.split(key)
    idx = jax.random.randint(k_pick, (n_worlds,), 0, pool_gts.shape[0])
    keys = jax.random.split(k_reset, n_worlds)
    return jax.vmap(lambda i, k: jax_env_subs.reset_from_positions(
        params, pos_ubs, pool_gts[i], k))(idx, keys)


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def collect_episode_subs(env_params, agent_apply, policy_params, states, h0,
                         T, L, key, eps):
    """Roll one T-step episode on B worlds; slice into T//L replay chunks.

    Returns ``(chunks, final_states, ep_stats)`` with chunk leaves shaped
    ``[B * (T//L), ...]`` in the ``SequenceReplayBuffer`` layout:
      obs   pytree [B', L+1, 1, ...]   (trailing next-obs; agent axis of 1)
      h     [B', 2, 1, H]              (h at slice start and start+1)
      act   [B', L, 1] / rew [B', L, 1] / done [B', L]
    Joint epsilon-greedy per world per step (one draw gates the single agent;
    reference ``algos/drqn/learner.py:54-65``).
    """
    assert T % L == 0, "episode_limit must be a multiple of max_seq_len"
    n_slices = T // L

    def one_step(carry, _):
        states, h, key = carry
        key, k_pol, k_eps, k_rand = jax.random.split(key, 4)
        obs = jax.vmap(lambda s: jax_env_subs.get_obs(env_params, s))(states)
        q, h2 = agent_apply(policy_params, obs, h, k_pol)
        greedy = jnp.argmax(q, axis=-1)                       # [B, 1]
        rand = jax.random.randint(k_rand, greedy.shape, 0, env_params.n_actions)
        explore = jax.random.uniform(k_eps, (greedy.shape[0], 1)) < eps
        acts = jnp.where(explore, rand, greedy)
        states2, _, rew, done = jax.vmap(
            lambda s, a: jax_env_subs.step(env_params, s, a))(states, acts[:, 0])
        out = dict(obs=obs, h=h, act=acts, rew=rew[:, None], done=done)
        return (states2, h2, key), out

    (states_f, h_f, _), traj = jax.lax.scan(
        one_step, (states, h0, key), None, length=T)

    obs_last = jax.vmap(lambda s: jax_env_subs.get_obs(env_params, s))(states_f)

    def bt(x):
        return jnp.moveaxis(x, 0, 1)                          # [T, B, ...] -> [B, T, ...]

    # Full sequences with the trailing next value.
    obs_full = jax.tree_util.tree_map(
        lambda seq, last: jnp.concatenate([bt(seq), last[:, None]], axis=1),
        traj["obs"], obs_last)                                # [B, T+1, ...]
    h_full = jnp.concatenate([bt(traj["h"]), h_f[:, None]], axis=1)  # [B, T+1, 1, H]

    # Static slice gather: slice i covers steps [i*L, (i+1)*L].
    t0 = jnp.arange(n_slices) * L                             # [S]
    idx_seq = t0[:, None] + jnp.arange(L + 1)[None, :]        # [S, L+1]
    idx_h = t0[:, None] + jnp.arange(2)[None, :]              # [S, 2]

    def slice_seq(x):                                         # [B, T+1, ...] -> [B*S, L+1, ...]
        sl = x[:, idx_seq]                                    # [B, S, L+1, ...]
        return sl.reshape((-1,) + sl.shape[2:])

    def slice_step(x):                                        # [B, T, ...] -> [B*S, L, ...]
        sl = x.reshape((x.shape[0], n_slices, L) + x.shape[2:])
        return sl.reshape((-1, L) + x.shape[2:])

    raw_done = slice_step(bt(traj["done"]).astype(jnp.float32))
    chunks = dict(
        obs=jax.tree_util.tree_map(slice_seq, obs_full),
        h=h_full[:, idx_h].reshape((-1, 2) + h_full.shape[2:]),
        act=slice_step(bt(traj["act"]).astype(jnp.int32)),
        rew=slice_step(bt(traj["rew"])),
        # Quirk 4: done=(1-bad_mask)*done with timeout-only termination -> 0.
        done=raw_done * (1.0 - raw_done),
    )

    ep_stats = dict(EpRet=states_f.ep_ret, FairIdx=states_f.fair_idx,
                    AvgGlobalUtility=states_f.avg_global_util,
                    TotalThroughput=states_f.total_throughput)
    return chunks, states_f, ep_stats


@partial(jax.jit, static_argnums=(0, 1, 5))
def eval_rollout_subs(env_params, agent_apply, policy_params, states, h0, T,
                      key, eps):
    """On-device test episodes (reference drqn ``test_agent`` at eps=0.05)."""

    def one_step(carry, _):
        states, h, key = carry
        key, k_pol, k_eps, k_rand = jax.random.split(key, 4)
        obs = jax.vmap(lambda s: jax_env_subs.get_obs(env_params, s))(states)
        q, h2 = agent_apply(policy_params, obs, h, k_pol)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_rand, greedy.shape, 0, env_params.n_actions)
        explore = jax.random.uniform(k_eps, (greedy.shape[0], 1)) < eps
        acts = jnp.where(explore, rand, greedy)
        states2, _, _, _ = jax.vmap(
            lambda s, a: jax_env_subs.step(env_params, s, a))(states, acts[:, 0])
        return (states2, h2, key), None

    (states_f, _, _), _ = jax.lax.scan(one_step, (states, h0, key), None, length=T)
    return dict(TestEpRet=states_f.ep_ret, TestFairIdx=states_f.fair_idx,
                TestAvgGlobalUtility=states_f.avg_global_util,
                TestTotalThroughput=states_f.total_throughput)


def evaluate_policy_subs(env_params, agent_apply, params, pool, hidden_size,
                         key, n_episodes, eps=0.05):
    k_reset, k_roll = jax.random.split(key)
    states = reset_subs_worlds(env_params, pool, k_reset, n_episodes)
    h0 = jnp.zeros((n_episodes, 1, hidden_size))
    return eval_rollout_subs(env_params, agent_apply, params, states, h0,
                             env_params.episode_limit, k_roll, jnp.float32(eps))
