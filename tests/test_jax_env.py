"""On-device JAX env vs NumPy env: step-by-step numerical parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.envs import jax_env
from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv


def _sync_envs(map_id, seed=0):
    """Create both envs with identical positions and initial priorities."""
    np.random.seed(seed)
    env = MultiUbsCoverageEnv(map_id=map_id, record=False, use_native=False)
    env.reset()

    params = jax_env.make_params(map_id)
    state = jax_env.reset_from_positions(params, env.pos_ubs, env.pos_gts,
                                         jax.random.PRNGKey(0))
    # Force identical initial priorities, then redo the t=0 service pass in both.
    state = state._replace(prior_gts=jnp.asarray(env.prior_gts, jnp.int32),
                           avg_rate_per_gt=jnp.zeros(params.n_gts),
                           total_throughput=jnp.float32(0),
                           avg_global_util=jnp.float32(0),
                           n_colls=jnp.float32(0))
    # NumPy env already ran _transmit_data in reset with its own priorities;
    # rerun both transmits from the same pre-transmit state.
    env.avg_rate_per_gt = np.zeros(env.n_gts, dtype=np.float32)
    env.total_throughput = 0
    env.avg_global_util = 0
    env.n_colls = 0
    pri = env.prior_gts.copy()
    env.prior_gts = pri
    env._transmit_data()
    state = jax_env._transmit(params, state._replace(
        prior_gts=jnp.asarray(pri, jnp.int32)))
    return env, params, state


@pytest.mark.parametrize("map_id", ["debug", "4ubs"])
def test_step_parity(map_id):
    env, params, state = _sync_envs(map_id)

    np.testing.assert_allclose(np.asarray(state.rate_per_gt), env.rate_per_gt,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.prior_gts), env.prior_gts)

    rng = np.random.default_rng(1)
    for t in range(8):
        acts = rng.integers(env.n_actions, size=env.n_agents)
        obs_np, state_np, rew_np, done_np, info = env.step(acts)
        state, obs_j, svec_j, rew_j, done_j = jax_env.step(params, state,
                                                           jnp.asarray(acts))

        np.testing.assert_allclose(np.asarray(rew_j), rew_np, rtol=1e-4, atol=1e-5,
                                   err_msg=f"reward @t={t}")
        np.testing.assert_allclose(np.asarray(svec_j), state_np, rtol=1e-4,
                                   atol=1e-5, err_msg=f"state @t={t}")
        np.testing.assert_allclose(np.asarray(state.rate_per_gt), env.rate_per_gt,
                                   rtol=1e-4, atol=1e-5, err_msg=f"rates @t={t}")
        np.testing.assert_allclose(np.asarray(state.prior_gts), env.prior_gts,
                                   err_msg=f"priorities @t={t}")
        assert bool(done_j) == done_np

        # Obs parity against the wrapper-layout arrays.
        obs_gt = np.stack([o["gt"] for o in obs_np])
        obs_ubs = np.stack([o["ubs"] for o in obs_np])
        obs_agent = np.stack([o["agent"] for o in obs_np])
        np.testing.assert_allclose(np.asarray(obs_j["agent"]), obs_agent,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(obs_j["gt"]), obs_gt,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(obs_j["ubs"]), obs_ubs,
                                   rtol=1e-4, atol=1e-5)


def test_vmapped_worlds_independent():
    """vmap over B worlds must equal per-world stepping."""
    params = jax_env.make_params("debug")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(lambda k: jax_env.reset(params, k))(keys)
    acts = jnp.zeros((4, params.n_ubs), jnp.int32)

    stepped = jax.vmap(lambda s, a: jax_env.step(params, s, a)[0])(states, acts)
    for b in range(4):
        single = jax_env.step(params,
                              jax.tree_util.tree_map(lambda x: x[b], states),
                              acts[b])[0]
        np.testing.assert_allclose(np.asarray(stepped.rate_per_gt[b]),
                                   np.asarray(single.rate_per_gt), rtol=1e-5)


def test_on_device_rollout_with_policy():
    """Full rollout (policy + env) compiles as one program and runs."""
    from types import SimpleNamespace as SN
    from uav_bs_ctrl_tpu.models.agents import GnnAgent

    params = jax_env.make_params("debug")
    args = SN(hidden_size=32, n_layers=1, n_heads=4, msg_size=16, key_size=8,
              n_rounds=1, dueling=False, c="tarmac", o="gnn")
    agent = GnnAgent(dict(agent=2, gt=4, ubs=2), params.n_actions, args)
    p = agent.init(jax.random.PRNGKey(0))

    state0 = jax_env.reset(params, jax.random.PRNGKey(1))
    h0 = jnp.zeros((params.n_ubs, 32))
    state, rews = jax.jit(jax_env.rollout, static_argnums=(0, 1, 6))(
        params, agent.apply, p, state0, h0, jax.random.PRNGKey(2), 10)
    assert rews.shape == (10, params.n_ubs)
    assert int(state.t) == 10
    assert np.isfinite(np.asarray(rews)).all()


def test_subs_jax_env_parity():
    """Jittable single-UBS env matches the NumPy env step-by-step."""
    from uav_bs_ctrl_tpu.envs import jax_env_subs
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv

    np.random.seed(0)
    env = SingleUbsCoverageEnv(n_grps=2, gts_per_grp=3, episode_limit=30,
                               record=False)
    env.reset()

    params = jax_env_subs.make_params(n_grps=2, gts_per_grp=3, episode_limit=30)
    state = jax_env_subs.reset_from_positions(params, env.pos_ubs, env.pos_gts,
                                              jax.random.PRNGKey(0))
    # Re-run both initial service passes from identical priorities.
    pri = env.prior_gts.copy()
    env.aver_rate_per_gt = np.zeros(env.n_gts, dtype=np.float32)
    env.total_throughput = 0
    env.avg_global_util = 0
    env.prior_gts = pri
    env._transmit_data()
    state = jax_env_subs._transmit(params, state._replace(
        prior_gts=jnp.asarray(pri, jnp.int32),
        aver_rate_per_gt=jnp.zeros(params.n_gts),
        total_throughput=jnp.float32(0), avg_global_util=jnp.float32(0)))

    np.testing.assert_allclose(np.asarray(state.rate_per_gt), env.rate_per_gt,
                               rtol=1e-5, atol=1e-6)

    rng = np.random.default_rng(1)
    for t in range(10):
        a = int(rng.integers(env.n_actions))
        obs_np, rew_np, done_np, info = env.step(a)
        state, obs_j, rew_j, done_j = jax_env_subs.step(params, state, a)
        np.testing.assert_allclose(float(rew_j), rew_np, rtol=1e-4, atol=1e-6,
                                   err_msg=f"reward @t={t}")
        np.testing.assert_allclose(np.asarray(state.prior_gts), env.prior_gts,
                                   err_msg=f"priorities @t={t}")
        np.testing.assert_allclose(np.asarray(obs_j["gt"][0]), obs_np["gt"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(obs_j["agent"][0]), obs_np["agent"],
                                   rtol=1e-5, atol=1e-6)
        assert bool(done_j) == done_np
