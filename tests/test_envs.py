"""Env behavior tests: channel math, fairness, physics sanity, determinism.

Mirrors the reference's smoke checks (``envs/mubs_cov/mubs_cov.py:353-364``
drives a UBS past a GT) and adds the unit coverage the reference lacks
(SURVEY.md §4).
"""

import numpy as np
import pytest

from uav_bs_ctrl_tpu.envs.common import AirToGroundChannel, jain_fairness_index, select_from_cube
from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv
from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv
from uav_bs_ctrl_tpu.envs import spaces


def test_jain_fairness():
    assert jain_fairness_index(np.array([])) == 1
    assert jain_fairness_index(np.ones(5)) == pytest.approx(1.0)
    # One active user out of n -> 1/n.
    x = np.zeros(4)
    x[0] = 7.0
    # zeros are clipped to 1e-6, so the index is slightly above 1/4
    assert jain_fairness_index(x) == pytest.approx(0.25, rel=1e-3)


def test_channel_monotone_decreasing():
    chan = AirToGroundChannel("dense-urban", 2.4e9)
    d = np.array([0.0, 50.0, 100.0, 500.0, 2000.0])
    g = chan.estimate_chan_gain(d, 100.0)
    assert np.all(np.diff(g) < 0)
    assert np.all(g > 0)


def test_channel_reference_value():
    # Gain at zero horizontal distance, dense-urban @2.4 GHz, h=100 m:
    # p_los ~= 1 at 90deg elevation; pl ~= FSPL * 10^(1.6/20).
    chan = AirToGroundChannel("dense-urban", 2.4e9)
    g = chan.estimate_chan_gain(0.0, 100.0)
    fspl = (4 * np.pi * 2.4e9 * 100.0 / 3e8) ** 2
    p_los = 1 / (1 + 12.08 * np.exp(-0.11 * (np.arctan(100 / 1e-5) - 12.08)))
    expect = 1 / (p_los * fspl * 10 ** (1.6 / 20) + (1 - p_los) * fspl * 10 ** (23 / 20))
    assert g == pytest.approx(expect)


def test_select_from_cube_distinct():
    np.random.seed(0)
    pts = select_from_cube(10, 0, 5, 2)
    assert pts.shape == (10, 2)
    assert len({tuple(p) for p in pts}) == 10
    assert pts.min() >= 0 and pts.max() < 5


def test_spaces_flatten_sorted_order():
    sp = spaces.Dict(spaces={
        "ubs": spaces.Box(-1, 1, shape=(2, 3)),
        "agent": spaces.Box(-1, 1, shape=(2,)),
        "gt": spaces.Box(-1, 1, shape=(1, 4)),
    })
    assert list(sp.spaces.keys()) == ["agent", "gt", "ubs"]
    x = {"agent": np.array([1, 2]), "gt": np.arange(4).reshape(1, 4) + 10,
         "ubs": np.arange(6).reshape(2, 3) + 20}
    flat = spaces.flatten(sp, x)
    assert flat.shape == (2 + 4 + 6,)
    np.testing.assert_allclose(flat[:2], [1, 2])
    np.testing.assert_allclose(flat[2:6], [10, 11, 12, 13])
    np.testing.assert_allclose(flat[6:], np.arange(6) + 20)


def test_mubs_rate_increases_on_approach():
    """Drive a UBS toward a GT: rate appears once within coverage and peaks overhead."""
    np.random.seed(0)
    env = MultiUbsCoverageEnv(map_id="test", record=False, use_native=False)
    env.reset()
    env.r_cov = np.inf
    env.pos_gts = np.array([[200.0, 200.0]], dtype=np.float32)
    rates = []
    for t in range(40):
        env.pos_ubs = np.array([[10.0 * t, 200.0]], dtype=np.float32)
        env.step([0])
        rates.append(env.rate_per_gt[0])
    # Peak when directly overhead (t=20 -> x=200).
    assert int(np.argmax(rates)) in (19, 20, 21)
    assert rates[20] > rates[0]


def test_mubs_step_api_and_shapes():
    np.random.seed(1)
    env = MultiUbsCoverageEnv(map_id="debug", record=False, use_native=False)
    obs, state = env.reset()
    assert len(obs) == env.n_agents == 3
    assert obs[0]["agent"].shape == (2,)
    assert obs[0]["ubs"].shape == (2, 3)
    assert obs[0]["gt"].shape == (4, 4 + 1)
    assert state.shape == (env.get_state_size(),)
    assert state.shape == (3 * 2 + 4 * 4,)

    for t in range(env.episode_limit):
        obs, state, rew, done, info = env.step([0] * env.n_agents)
        assert rew.shape == (3,)
    assert done and info["BadMask"]
    assert info["EpLen"] == env.episode_limit


def test_mubs_debug_map_deterministic_layout():
    env = MultiUbsCoverageEnv(map_id="debug", record=False, use_native=False)
    env.reset()
    np.testing.assert_array_equal(env.pos_ubs, 100 * np.array([[3, 3], [8, 2], [8, 9]]))
    # UBS-0 at (300,300); GT-0 at (300,400): distance 100, within r_sns=300.
    assert env.d_u2g[0, 0] == pytest.approx(100.0)
    obs = env.get_obs_agent(0)
    assert obs["gt"][0, 0] == 1  # visible
    assert obs["gt"][3, 0] == 0  # GT-3 at (600,900) is far


def test_mubs_collision_penalty():
    np.random.seed(2)
    env = MultiUbsCoverageEnv(map_id="debug", record=False, use_native=False)
    env.reset()
    env.pos_ubs = np.array([[100.0, 100.0], [104.0, 100.0], [800.0, 900.0]], dtype=np.float32)
    _, _, rew, _, _ = env.step([0, 0, 0])
    # First two UBSs are within safe_dist=10 -> both penalized with -5.
    assert rew[0] == pytest.approx(-5.0)
    assert rew[1] == pytest.approx(-5.0)
    assert rew[2] > -5.0


def test_mubs_idle_ubs_zero_reward():
    np.random.seed(3)
    env = MultiUbsCoverageEnv(map_id="debug", record=False, use_native=False)
    env.reset()
    # All UBSs far from all GTs -> no service -> idle -> zero reward (no collision).
    env.pos_gts = np.array([[0, 0], [0, 10], [10, 0], [10, 10]], dtype=np.float32)
    env.pos_ubs = np.array([[900.0, 900.0], [500.0, 900.0], [900.0, 500.0]], dtype=np.float32)
    _, _, rew, _, _ = env.step([0, 0, 0])
    np.testing.assert_allclose(rew, 0.0)


def test_mubs_rb_scheduling_capacity():
    """A UBS with n_rbs=1 serves at most one GT."""
    np.random.seed(4)
    env = MultiUbsCoverageEnv(map_id="debug", record=False, use_native=False)
    env.reset()
    # Put all GTs on top of UBS-0.
    env.pos_gts = np.tile(env.pos_ubs[0], (4, 1)).astype(np.float32)
    env.pos_ubs[1:] = [[900, 100], [900, 900]]
    env.step([0, 0, 0])
    assert env.sched[0].sum() <= env.n_rbs
    assert env.sched.sum() <= env.n_ubs * env.n_rbs


def test_subs_env_episode():
    np.random.seed(5)
    env = SingleUbsCoverageEnv(n_grps=2, gts_per_grp=2, episode_limit=20, record=False)
    obs = env.reset()
    assert obs["agent"].shape == (2,)
    assert obs["gt"].shape == (4, 4)
    total = 0.0
    for t in range(20):
        obs, rew, done, info = env.step(0)
        total += rew
    assert done and info["BadMask"]
    assert info["EpRet"] == pytest.approx(total)


def test_subs_rate_positive_when_covered():
    np.random.seed(6)
    env = SingleUbsCoverageEnv(n_grps=1, gts_per_grp=1, record=False)
    env.reset()
    env.pos_gts = env.pos_ubs.reshape(1, 2).copy()
    env.prior_gts = np.array([0])
    env._transmit_data()
    assert env.rate_per_gt[0] > 0
    assert env.sched[0]


def test_env_determinism_same_seed():
    def rollout():
        np.random.seed(42)
        env = MultiUbsCoverageEnv(map_id="test", record=False, use_native=False)
        env.reset()
        rews = []
        for _ in range(10):
            _, _, r, _, _ = env.step(np.random.randint(env.n_actions, size=env.n_agents))
            rews.append(r.copy())
        return np.stack(rews)

    np.testing.assert_array_equal(rollout(), rollout())
