"""On-device jittable single-UBS coverage environment (exp1 physics).

Unlike the multi-UBS scheduler (sequential over GTs because of interference
coupling), the single-UBS greedy scheduler vectorizes COMPLETELY: GTs are
ranked by priority, eligibility is ``d <= r_cov``, and the first ``n_rbs``
eligible GTs in priority order are served — a permutation + cumulative count,
no loop at all (reference semantics ``envs/subs_cov/subs_cov.py:135-157``).

Parity is validated step-by-step against the NumPy env in
``tests/test_jax_env.py``.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uav_bs_ctrl_tpu.envs.common import AirToGroundChannel


class SubsParams(NamedTuple):
    n_gts: int
    n_rbs: int
    n_grps: int
    n_actions: int
    range_pos: float
    episode_limit: int
    dt: float
    r_cov: float
    reward_scale_rate: float
    h_ubs: float
    p_tx: float
    noise: float
    bw: float
    max_rate: float
    chan_a: float
    chan_b: float
    eta_los: float
    eta_nlos: float
    fc: float
    avail_moves: tuple


class SubsState(NamedTuple):
    t: jnp.ndarray
    pos_ubs: jnp.ndarray          # [2]
    pos_gts: jnp.ndarray          # [M, 2]
    prior_gts: jnp.ndarray        # [M]
    aver_rate_per_gt: jnp.ndarray # [M]
    rate_per_gt: jnp.ndarray      # [M]
    fair_idx: jnp.ndarray
    global_util: jnp.ndarray
    avg_global_util: jnp.ndarray
    total_throughput: jnp.ndarray
    ep_ret: jnp.ndarray


def make_params(range_pos=1000, episode_limit=200, n_grps=2, gts_per_grp=1,
                r_cov=100.0, n_rbs=10, vels=10, n_dirs=4) -> SubsParams:
    chan = AirToGroundChannel("urban", 2.4e9)
    p_tx = 1e-3 * 10 ** (10 / 10)
    n0 = 1e-3 * 10 ** (-170 / 10)
    bw = 180e3
    g_max = chan.estimate_chan_gain(0, 100.0)
    max_rate = bw * np.log2(1 + p_tx * g_max / (n0 * bw)) * 1e-6

    move_amounts = 10 * np.array(vels).reshape(-1, 1)
    ang = 2 * np.pi * np.arange(n_dirs) / n_dirs
    move_dirs = np.stack([np.cos(ang), np.sin(ang)]).T
    avail_moves = np.concatenate((np.zeros((1, 2)), np.kron(move_amounts, move_dirs)))

    return SubsParams(
        n_gts=n_grps * gts_per_grp, n_rbs=n_rbs, n_grps=n_grps,
        n_actions=avail_moves.shape[0], range_pos=float(range_pos),
        episode_limit=int(episode_limit), dt=10.0, r_cov=float(r_cov),
        reward_scale_rate=float(n_grps), h_ubs=100.0, p_tx=p_tx, noise=bw * n0,
        bw=bw, max_rate=float(max_rate), chan_a=chan.a, chan_b=chan.b,
        eta_los=chan.eta_los, eta_nlos=chan.eta_nlos, fc=chan.fc,
        avail_moves=tuple(map(tuple, avail_moves.tolist())))


def _chan_gain(params, d_level):
    p_los = 1.0 / (1.0 + params.chan_a * jnp.exp(
        -params.chan_b * (jnp.arctan(params.h_ubs / (d_level + 1e-5)) - params.chan_a)))
    d = jnp.sqrt(jnp.square(d_level) + params.h_ubs ** 2)
    fspl = (4.0 * jnp.pi * params.fc * d / 3e8) ** 2
    pl = (p_los * fspl * 10 ** (params.eta_los / 20)
          + (1 - p_los) * fspl * 10 ** (params.eta_nlos / 20))
    return 1.0 / pl


def _jain(x):
    x = jnp.clip(x, 1e-6, jnp.inf)
    return jnp.square(x.sum()) / (x.size * jnp.square(x).sum())


def _transmit(params: SubsParams, state: SubsState) -> SubsState:
    d = jnp.linalg.norm(state.pos_gts - state.pos_ubs, axis=-1).astype(jnp.float32)

    # Vectorized greedy scheduling: first n_rbs in-range GTs in priority order.
    eligible_in_order = d[state.prior_gts] <= params.r_cov          # [M]
    rank = jnp.cumsum(eligible_in_order.astype(jnp.int32))
    sched_in_order = eligible_in_order & (rank <= params.n_rbs)
    # Scatter back to GT index order via the inverse permutation.
    inv = jnp.argsort(state.prior_gts, stable=True)
    sched = sched_in_order[inv]

    g = _chan_gain(params, d)
    sinr = params.p_tx * g * sched / params.noise
    rate = (params.bw * jnp.log2(1 + sinr) * 1e-6).astype(jnp.float32)

    t_f = state.t.astype(jnp.float32)
    aver = (state.aver_rate_per_gt * t_f + rate) / (t_f + 1)
    total_tp = state.total_throughput + rate.sum() * params.dt / 1e3
    fair = _jain(aver).astype(jnp.float32)
    gu = fair * rate.mean()
    avg_gu = (state.avg_global_util * t_f + gu) / (t_f + 1)
    prior = jnp.argsort(aver, stable=True).astype(jnp.int32)

    return state._replace(rate_per_gt=rate, aver_rate_per_gt=aver,
                          total_throughput=total_tp, fair_idx=fair,
                          global_util=gu, avg_global_util=avg_gu, prior_gts=prior)


def reset_from_positions(params: SubsParams, pos_ubs, pos_gts, key) -> SubsState:
    M = params.n_gts
    state = SubsState(
        t=jnp.int32(0), pos_ubs=jnp.asarray(pos_ubs, jnp.float32),
        pos_gts=jnp.asarray(pos_gts, jnp.float32),
        prior_gts=jax.random.permutation(key, M).astype(jnp.int32),
        aver_rate_per_gt=jnp.zeros(M, jnp.float32),
        rate_per_gt=jnp.zeros(M, jnp.float32),
        fair_idx=jnp.float32(0), global_util=jnp.float32(0),
        avg_global_util=jnp.float32(0), total_throughput=jnp.float32(0),
        ep_ret=jnp.float32(0))
    return _transmit(params, state)


@partial(jax.jit, static_argnums=0)
def step(params: SubsParams, state: SubsState, action):
    move = jnp.asarray(params.avail_moves, jnp.float32)[action]
    pos = jnp.clip(state.pos_ubs + move, 0, params.range_pos)
    state = state._replace(t=state.t + 1, pos_ubs=pos)
    state = _transmit(params, state)
    rew = params.reward_scale_rate * state.global_util / params.max_rate
    state = state._replace(ep_ret=state.ep_ret + rew)
    done = state.t == params.episode_limit
    return state, get_obs(params, state), rew, done


def get_obs(params: SubsParams, state: SubsState) -> dict:
    own = state.pos_ubs / params.range_pos
    gt = jnp.concatenate([
        (state.pos_gts - state.pos_ubs) / params.range_pos,
        (state.rate_per_gt / params.max_rate)[:, None],
        (state.aver_rate_per_gt / params.max_rate * params.n_grps)[:, None],
    ], axis=-1)
    return {"agent": own.astype(jnp.float32)[None, :],
            "gt": gt.astype(jnp.float32)[None, :, :]}
