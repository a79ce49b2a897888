"""On-device vectorized experience collection.

A capability beyond the reference's host-driven loop: rollouts run entirely on
the accelerator — ``vmap`` over B parallel worlds of the jittable env
(``envs.jax_env``) and ``lax.scan`` over the chunk length — so the
host<->device boundary is crossed ONCE per chunk instead of once per step.
Collected chunks arrive already in the replay layout ([B, T(+1), ...]), ready
to push into the host ring buffer or feed straight to the jitted update.

Episode alignment: episodes terminate only by timeout (reference quirk 4) and
``max_seq_len`` defaults to ``episode_limit``, so chunk boundaries coincide
with episode boundaries; each ``collect_chunk`` call covers exactly one
episode per world, starting from freshly reset states.

Reset layouts come from a host-side layout pool (hotspot maps keep their
exact NumPy layout distributions); on-device uniform resets are also
available for pure-bench paths.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.envs import jax_env


def make_layout_pool(map_id, n_layouts, seed=0):
    """Pre-generate layout positions with the map's own NumPy generator."""
    from uav_bs_ctrl_tpu.envs.maps import MAPS
    m = MAPS[map_id]
    rng_state = np.random.get_state()
    np.random.seed(seed)
    ubs, gts = [], []
    for _ in range(n_layouts):
        pos = m.set_positions()
        ubs.append(np.asarray(pos["ubs"], np.float32))
        gts.append(np.asarray(pos["gt"], np.float32))
    np.random.set_state(rng_state)
    return jnp.asarray(np.stack(ubs)), jnp.asarray(np.stack(gts))


def reset_worlds(params, pool, key, n_worlds):
    """Reset B worlds from random pool layouts (vmapped, on device)."""
    pool_ubs, pool_gts = pool
    k_pick, k_reset = jax.random.split(key)
    idx = jax.random.randint(k_pick, (n_worlds,), 0, pool_ubs.shape[0])
    keys = jax.random.split(k_reset, n_worlds)
    return jax.vmap(lambda i, k: jax_env.reset_from_positions(
        params, pool_ubs[i], pool_gts[i], k))(idx, keys)


@partial(jax.jit, static_argnums=(0, 1, 5))
def collect_chunk(env_params, agent_apply, policy_params, states, h0, T, key, eps):
    """Roll T steps on B worlds; returns (chunk, final_states, ep_stats).

    chunk layout matches ``SequenceReplayBuffer`` batches:
      obs   pytree [B, T+1, ...]   (trailing next-obs)
      h     [B, 2, A, H]           (h at t=0 and t=1 — all BPTT needs)
      state [B, T+1, ds]
      act   [B, T, A] / rew [B, T, A] / done [B, T]
    Joint epsilon-greedy per world per step (reference exploration quirk).
    """

    def one_step(carry, _):
        states, h, key = carry
        key, k_pol, k_eps, k_rand = jax.random.split(key, 4)
        obs = jax.vmap(lambda s: jax_env.get_obs(env_params, s))(states)
        svec = jax.vmap(lambda s: jax_env.get_state_vec(env_params, s))(states)
        q, h2 = agent_apply(policy_params, obs, h, k_pol)
        greedy = jnp.argmax(q, axis=-1)                       # [B, A]
        rand = jax.random.randint(k_rand, greedy.shape, 0, env_params.n_actions)
        explore = jax.random.uniform(k_eps, (greedy.shape[0], 1)) < eps
        acts = jnp.where(explore, rand, greedy)
        states2, _, _, rew, done = jax.vmap(
            lambda s, a: jax_env.step(env_params, s, a))(states, acts)
        out = dict(obs=obs, state=svec, h=h, act=acts, rew=rew, done=done)
        return (states2, h2, key), out

    B = h0.shape[0]
    (states_f, h_f, _), traj = jax.lax.scan(
        one_step, (states, h0, key), None, length=T)

    # Trailing next obs/state from the final states; time-major -> batch-major.
    obs_last = jax.vmap(lambda s: jax_env.get_obs(env_params, s))(states_f)
    svec_last = jax.vmap(lambda s: jax_env.get_state_vec(env_params, s))(states_f)

    def bt(x):
        return jnp.moveaxis(x, 0, 1)                          # [T, B, ...] -> [B, T, ...]

    obs_full = jax.tree_util.tree_map(
        lambda seq, last: jnp.concatenate([bt(seq), last[:, None]], axis=1),
        traj["obs"], obs_last)
    state_full = jnp.concatenate([bt(traj["state"]), svec_last[:, None]], axis=1)
    h_pair = bt(traj["h"])[:, :2]                             # h at t=0, t=1

    # Reference quirk 4 (SURVEY.md §2.4): stored done = (1 - bad_mask) * done,
    # and episodes terminate only by timeout (bad_mask == done), so the stored
    # flag is identically zero — TD targets ALWAYS bootstrap.  The host path
    # applies the same rule in ``RecurrentQLearner.cache``.
    raw_done = bt(traj["done"]).astype(jnp.float32)
    chunk = dict(obs=obs_full, h=h_pair, state=state_full,
                 act=bt(traj["act"]).astype(jnp.int32),
                 rew=bt(traj["rew"]), done=raw_done * (1.0 - raw_done))

    ep_stats = dict(EpRet=states_f.ep_ret, FairIdx=states_f.fair_idx,
                    AvgGlobalUtility=states_f.avg_global_util,
                    TotalThroughput=states_f.total_throughput,
                    ProbCollision=states_f.n_colls / jnp.maximum(
                        states_f.t.astype(jnp.float32), 1))
    del B
    return chunk, states_f, ep_stats


@partial(jax.jit, static_argnums=(0, 1, 5))
def eval_rollout(env_params, agent_apply, policy_params, states, h0, T, key, eps):
    """On-device test episodes: roll T steps on B worlds, return episode stats.

    The device analog of the reference's ``test_agent`` (``algos/madrqn/run.py``
    per-epoch greedy rollouts at eps=0.05): same joint epsilon-greedy rule, but
    no experience is materialized — only final episode statistics cross the
    host boundary.
    """

    def one_step(carry, _):
        states, h, key = carry
        key, k_pol, k_eps, k_rand = jax.random.split(key, 4)
        obs = jax.vmap(lambda s: jax_env.get_obs(env_params, s))(states)
        q, h2 = agent_apply(policy_params, obs, h, k_pol)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_rand, greedy.shape, 0, env_params.n_actions)
        explore = jax.random.uniform(k_eps, (greedy.shape[0], 1)) < eps
        acts = jnp.where(explore, rand, greedy)
        states2, _, _, _, _ = jax.vmap(
            lambda s, a: jax_env.step(env_params, s, a))(states, acts)
        return (states2, h2, key), None

    (states_f, _, _), _ = jax.lax.scan(one_step, (states, h0, key), None, length=T)
    return dict(TestEpRet=states_f.ep_ret, TestFairIdx=states_f.fair_idx,
                TestAvgGlobalUtility=states_f.avg_global_util,
                TestTotalThroughput=states_f.total_throughput,
                TestProbCollision=states_f.n_colls / jnp.maximum(
                    states_f.t.astype(jnp.float32), 1))


def evaluate_policy(env_params, agent_apply, params, pool, hidden_size,
                    key, n_episodes, eps=0.05):
    """Run ``n_episodes`` parallel on-device test episodes; returns stat arrays."""
    k_reset, k_roll = jax.random.split(key)
    states = reset_worlds(env_params, pool, k_reset, n_episodes)
    h0 = jnp.zeros((n_episodes, env_params.n_ubs, hidden_size))
    return eval_rollout(env_params, agent_apply, params, states, h0,
                        env_params.episode_limit, k_roll, jnp.float32(eps))
