"""Fully on-device (jittable, vmappable) multi-UBS coverage environment.

A capability BEYOND the reference: the entire environment — air-to-ground
channel, priority-ordered interference-aware RB scheduling, rewards,
observations — is a pure JAX function over a fixed-shape state pytree.  Whole
rollouts (env physics + policy forward) therefore run inside ONE compiled XLA
program with ``lax.scan`` over time and ``vmap`` over parallel worlds: no
host<->device ping-pong per step, which is what bounds the classic
host-driven loop (reference architecture) on accelerators.

Semantics are bit-matched (float32) against ``MultiUbsCoverageEnv`` (NumPy)
under stable sorting — see ``tests/test_jax_env.py``.  The only semantic
deviations, both documented:

- tie-breaking in ``argsort``/``argmin`` is 'first index wins' (stable), which
  the NumPy env also uses (the upstream reference leaves quicksort ties
  unspecified);
- reset layouts are sampled uniformly on-device (hotspot map layouts stay
  host-side; pass explicit positions for those).

Scheduling semantics (reference ``envs/mubs_cov/mubs_cov.py:172-200`` "V2"):
GTs visited in priority order; each attaches to its nearest in-range UBS with
a free RB, choosing the idle RB with the least accumulated interference; the
serving UBS then radiates interference on that RB to every GT inside its
coverage except the served one.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uav_bs_ctrl_tpu.envs.common import AirToGroundChannel
from uav_bs_ctrl_tpu.envs.maps import MAPS

_INF = jnp.inf


class EnvParams(NamedTuple):
    """Static physics/scenario parameters (all python/np scalars)."""
    n_ubs: int
    n_gts: int
    n_rbs: int
    n_actions: int
    range_pos: float
    episode_limit: int
    dt: float
    r_cov: float
    r_sns: float
    r_comm: float
    reward_scale_rate: float
    h_ubs: float
    p_tx: float
    noise: float           # bw * n0 (W)
    bw: float
    max_rate: float
    chan_a: float
    chan_b: float
    eta_los: float
    eta_nlos: float
    fc: float
    safe_dist: float
    penalty: float
    fair_service: bool
    avoid_collision: bool
    avail_moves: tuple      # ((dx, dy), ...) hashable for jit-static use


class EnvState(NamedTuple):
    """Dynamic per-world state (fixed-shape jnp arrays)."""
    t: jnp.ndarray                 # () int32
    pos_ubs: jnp.ndarray           # [N, 2] f32
    pos_gts: jnp.ndarray           # [M, 2] f32
    prior_gts: jnp.ndarray         # [M] int32
    avg_rate_per_gt: jnp.ndarray   # [M] f32
    rate_per_gt: jnp.ndarray       # [M] f32
    rate_per_ubs: jnp.ndarray      # [N] f32
    d_u2g: jnp.ndarray             # [N, M] f32
    d_u2u: jnp.ndarray             # [N, N] f32
    mask_collision: jnp.ndarray    # [N] bool
    fair_idx: jnp.ndarray          # () f32
    global_util: jnp.ndarray       # () f32
    avg_global_util: jnp.ndarray   # () f32
    total_throughput: jnp.ndarray  # () f32
    n_colls: jnp.ndarray           # () f32
    ep_ret: jnp.ndarray            # () f32


def make_params(map_id: str, fair_service=True, avoid_collision=True) -> EnvParams:
    """Build EnvParams from a named map (matching the NumPy env's constants)."""
    m = MAPS[map_id]
    p = m.get_params()
    chan = AirToGroundChannel("dense-urban", 2.4e9)
    p_tx = 1e-3 * 10 ** (10 / 10)
    n0 = 1e-3 * 10 ** (-170 / 10)
    bw = 180e3
    g_max = chan.estimate_chan_gain(0, 100.0)
    snr_max = p_tx * g_max / (n0 * bw)
    max_rate = bw * np.log2(1 + snr_max) * 1e-6

    move_amounts = p["dt"] * np.array(p["vels"]).reshape(-1, 1)
    ang = 2 * np.pi * np.arange(p["n_dirs"]) / p["n_dirs"]
    move_dirs = np.stack([np.cos(ang), np.sin(ang)]).T
    avail_moves = np.concatenate((np.zeros((1, 2)), np.kron(move_amounts, move_dirs)))

    return EnvParams(
        n_ubs=int(p["n_ubs"]), n_gts=int(p["n_gts"]), n_rbs=int(p["n_rbs"]),
        n_actions=int(avail_moves.shape[0]), range_pos=float(p["range_pos"]),
        episode_limit=int(p["episode_limit"]), dt=float(p["dt"]),
        r_cov=float(p["r_cov"]), r_sns=float(p["r_sns"]), r_comm=float(p["r_comm"]),
        reward_scale_rate=float(p["reward_scale_rate"]), h_ubs=100.0, p_tx=p_tx,
        noise=bw * n0, bw=bw, max_rate=float(max_rate),
        chan_a=chan.a, chan_b=chan.b, eta_los=chan.eta_los, eta_nlos=chan.eta_nlos,
        fc=chan.fc, safe_dist=10.0, penalty=5.0,
        fair_service=bool(fair_service), avoid_collision=bool(avoid_collision),
        avail_moves=tuple(map(tuple, avail_moves.tolist())),
    )


def _chan_gain(params: EnvParams, d_level):
    p_los = 1.0 / (1.0 + params.chan_a * jnp.exp(
        -params.chan_b * (jnp.arctan(params.h_ubs / (d_level + 1e-5)) - params.chan_a)))
    d = jnp.sqrt(jnp.square(d_level) + params.h_ubs ** 2)
    fspl = (4.0 * jnp.pi * params.fc * d / 3e8) ** 2
    pl = (p_los * fspl * 10 ** (params.eta_los / 20)
          + (1 - p_los) * fspl * 10 ** (params.eta_nlos / 20))
    return 1.0 / pl


def _jain(x):
    x = jnp.clip(x, 1e-6, _INF)
    return jnp.square(x.sum()) / (x.size * jnp.square(x).sum())


def _schedule(params: EnvParams, d_u2g, gain, prior_gts):
    """Priority/interference-aware RB assignment (sequential over GTs).

    Two equivalent loop-body formulations (validated against each other and
    against the NumPy env):

    - 'scatter' (default): dynamic-index ``.at[]`` updates — the formulation
      validated end-to-end on the TPU chip (~35k env steps/s with the policy
      in the loop at 512 vmapped worlds).
    - 'onehot': scatter-free one-hot mask algebra; everything lowers to dense
      vector work.  Kept as an alternative (toggle ``SCHEDULE_IMPL``); the
      dev rig's remote compiler currently stalls on the vmapped variant.
    """
    if SCHEDULE_IMPL == "onehot":
        return _schedule_body_onehot(params, d_u2g, gain, prior_gts)
    return _schedule_body_scatter(params, d_u2g, gain, prior_gts)


SCHEDULE_IMPL = "scatter"


def _schedule_body_scatter(params: EnvParams, d_u2g, gain, prior_gts):
    N, M, R = params.n_ubs, params.n_gts, params.n_rbs

    def body(pm, carry):
        used_rbs, rb_occ, p_itf, sched = carry
        m = prior_gts[pm]
        d_col = d_u2g[:, m]                                      # [N]
        eligible = (used_rbs < R) & (d_col <= params.r_cov)
        i = jnp.argmin(jnp.where(eligible, d_col, _INF))         # nearest eligible
        ok = eligible.any()

        itf_per_chan = p_itf[:, m, :].sum(0)                     # [R]
        occ_i = rb_occ[i]                                        # [R]
        c = jnp.argmin(jnp.where(occ_i, _INF, itf_per_chan))     # least-itf idle RB

        sched = sched.at[i, m, c].set(sched[i, m, c] | ok)
        rb_occ = rb_occ.at[i, c].set(rb_occ[i, c] | ok)
        used_rbs = used_rbs.at[i].add(jnp.where(ok, 1, 0))
        # UBS i radiates on RB c to covered GTs, except the served one.
        row = jnp.where(d_u2g[i] <= params.r_cov, params.p_tx * gain[i], 0.0)
        row = row.at[m].set(0.0)
        p_itf = p_itf.at[i, :, c].set(jnp.where(ok, row, p_itf[i, :, c]))
        return used_rbs, rb_occ, p_itf, sched

    init = (jnp.zeros(N, jnp.int32), jnp.zeros((N, R), bool),
            jnp.zeros((N, M, R), jnp.float32), jnp.zeros((N, M, R), bool))
    used_rbs, rb_occ, p_itf, sched = jax.lax.fori_loop(0, M, body, init)
    return _rates_from_schedule(params, gain, p_itf, sched)


def _schedule_body_onehot(params: EnvParams, d_u2g, gain, prior_gts):
    N, M, R = params.n_ubs, params.n_gts, params.n_rbs
    prior_oh = jax.nn.one_hot(prior_gts, M, dtype=d_u2g.dtype)   # [M, M]

    def body(pm, carry):
        used_rbs, rb_occ, p_itf, sched = carry
        m_oh = prior_oh[pm]                                      # [M] one-hot of GT m
        d_col = d_u2g @ m_oh                                     # [N]
        eligible = (used_rbs < R) & (d_col <= params.r_cov)
        i = jnp.argmin(jnp.where(eligible, d_col, _INF))         # nearest eligible
        ok = eligible.any()
        i_oh = jax.nn.one_hot(i, N, dtype=d_u2g.dtype) * ok      # [N]

        itf_per_chan = jnp.einsum("nmr,m->r", p_itf, m_oh)       # [R]
        occ_i = jnp.einsum("nr,n->r", rb_occ.astype(d_u2g.dtype), i_oh)  # [R]
        c = jnp.argmin(jnp.where(occ_i > 0, _INF, itf_per_chan))
        c_oh = jax.nn.one_hot(c, R, dtype=d_u2g.dtype)           # [R]

        hit_nr = i_oh[:, None] * c_oh[None, :]                   # [N, R]
        sched = sched | (hit_nr[:, None, :] * m_oh[None, :, None] > 0)
        rb_occ = rb_occ | (hit_nr > 0)
        used_rbs = used_rbs + (i_oh > 0)

        # UBS i radiates on RB c to covered GTs, except the served one.
        d_i = jnp.einsum("nm,n->m", d_u2g, i_oh)                 # [M]
        g_i = jnp.einsum("nm,n->m", gain.astype(d_u2g.dtype), i_oh)
        row = jnp.where(d_i <= params.r_cov, params.p_tx * g_i, 0.0) * (1 - m_oh)
        mask3 = hit_nr[:, None, :]                               # [N, 1, R]
        p_itf = p_itf * (1 - mask3) + mask3 * row[None, :, None]
        return used_rbs, rb_occ, p_itf, sched

    init = (jnp.zeros(N, jnp.int32), jnp.zeros((N, R), bool),
            jnp.zeros((N, M, R), jnp.float32), jnp.zeros((N, M, R), bool))
    used_rbs, rb_occ, p_itf, sched = jax.lax.fori_loop(0, M, body, init)
    return _rates_from_schedule(params, gain, p_itf, sched)


def _rates_from_schedule(params: EnvParams, gain, p_itf, sched):

    # Per-GT rate over its (single) serving link.
    serving = sched.any(axis=(0, 2))                              # [M]
    g_serv = jnp.einsum("imc,im->m", sched.astype(gain.dtype), gain)
    itf_serv = jnp.einsum("imc,jmc->m", sched.astype(p_itf.dtype), p_itf)
    sinr = params.p_tx * g_serv / (itf_serv + params.noise)
    rate_per_gt = jnp.where(serving,
                            params.bw * jnp.log2(1 + sinr) * 1e-6, 0.0).astype(jnp.float32)
    rate_per_ubs = jnp.einsum("imc,m->i", sched.astype(jnp.float32), rate_per_gt)
    return sched, rate_per_gt, rate_per_ubs


def _transmit(params: EnvParams, state: EnvState) -> EnvState:
    d_u2g = jnp.linalg.norm(state.pos_ubs[:, None, :] - state.pos_gts[None, :, :],
                            axis=-1).astype(jnp.float32)
    d_u2u = jnp.linalg.norm(state.pos_ubs[:, None, :] - state.pos_ubs[None, :, :],
                            axis=-1).astype(jnp.float32)
    mask_collision = ((d_u2u + 99999 * jnp.eye(params.n_ubs)) < params.safe_dist).any(1)
    n_colls = state.n_colls + mask_collision.sum() / 2

    gain = _chan_gain(params, d_u2g)
    _, rate_per_gt, rate_per_ubs = _schedule(params, d_u2g, gain, state.prior_gts)

    t_f = state.t.astype(jnp.float32)
    avg_rate = (state.avg_rate_per_gt * t_f + rate_per_gt) / (t_f + 1)
    total_tp = state.total_throughput + rate_per_gt.sum() * params.dt / 1e3
    fair_idx = _jain(avg_rate).astype(jnp.float32)
    global_util = fair_idx * rate_per_gt.mean()
    avg_gu = (state.avg_global_util * t_f + global_util) / (t_f + 1)
    prior = jnp.argsort(avg_rate, stable=True).astype(jnp.int32)

    return state._replace(
        d_u2g=d_u2g, d_u2u=d_u2u, mask_collision=mask_collision, n_colls=n_colls,
        rate_per_gt=rate_per_gt, rate_per_ubs=rate_per_ubs,
        avg_rate_per_gt=avg_rate, total_throughput=total_tp, fair_idx=fair_idx,
        global_util=global_util, avg_global_util=avg_gu, prior_gts=prior)


def _reward(params: EnvParams, state: EnvState):
    base = state.global_util if params.fair_service else state.rate_per_gt.mean()
    local = params.reward_scale_rate * base / params.max_rate * jnp.ones(params.n_ubs)
    local = local * (1 - (state.rate_per_ubs == 0))
    if params.avoid_collision:
        coll = state.mask_collision.astype(jnp.float32)
        local = (1 - coll) * local - coll * params.penalty
    return local.astype(jnp.float32)


def reset_from_positions(params: EnvParams, pos_ubs, pos_gts, key) -> EnvState:
    """Initialize a world from explicit positions (host map layouts)."""
    N, M = params.n_ubs, params.n_gts
    state = EnvState(
        t=jnp.int32(0),
        pos_ubs=jnp.asarray(pos_ubs, jnp.float32),
        pos_gts=jnp.asarray(pos_gts, jnp.float32),
        prior_gts=jax.random.permutation(key, M).astype(jnp.int32),
        avg_rate_per_gt=jnp.zeros(M, jnp.float32),
        rate_per_gt=jnp.zeros(M, jnp.float32),
        rate_per_ubs=jnp.zeros(N, jnp.float32),
        d_u2g=jnp.zeros((N, M), jnp.float32),
        d_u2u=jnp.zeros((N, N), jnp.float32),
        mask_collision=jnp.zeros(N, bool),
        fair_idx=jnp.float32(0), global_util=jnp.float32(0),
        avg_global_util=jnp.float32(0), total_throughput=jnp.float32(0),
        n_colls=jnp.float32(0), ep_ret=jnp.float32(0))
    # Initial service pass at t=0 (matching NumPy env reset()).
    return _transmit(params, state)


def reset(params: EnvParams, key) -> EnvState:
    """Uniform-random on-device reset (scaling/bench path)."""
    k_u, k_g, k_p = jax.random.split(key, 3)
    pos_ubs = jax.random.uniform(k_u, (params.n_ubs, 2), maxval=params.range_pos)
    pos_gts = jax.random.uniform(k_g, (params.n_gts, 2), maxval=params.range_pos)
    return reset_from_positions(params, pos_ubs, pos_gts, k_p)


@partial(jax.jit, static_argnums=0)
def step(params: EnvParams, state: EnvState, actions):
    """One env step; returns (state', obs, state_vec, reward, done)."""
    moves = jnp.asarray(params.avail_moves, jnp.float32)[actions]
    pos_ubs = jnp.clip(state.pos_ubs + moves, 0, params.range_pos)
    state = state._replace(t=state.t + 1, pos_ubs=pos_ubs)
    state = _transmit(params, state)
    rew = _reward(params, state)
    state = state._replace(ep_ret=state.ep_ret + rew.mean())
    done = state.t == params.episode_limit
    return state, get_obs(params, state), get_state_vec(params, state), rew, done


def get_obs(params: EnvParams, state: EnvState) -> dict:
    """Padded-neighborhood obs dict (same layout as the wrapper's arrays)."""
    N, M = params.n_ubs, params.n_gts
    own = state.pos_ubs / params.range_pos                       # [N, 2]

    # Other-UBS rows: for agent i, row j enumerates OTHER ubs in index order.
    others = _others_index(N)                                     # [N, N-1]
    rel = (state.pos_ubs[others] - state.pos_ubs[:, None, :]) / min(params.range_pos,
                                                                    params.r_comm)
    d_other = jnp.take_along_axis(state.d_u2u, others, axis=1)    # [N, N-1]
    vis_u = (d_other <= params.r_comm)[..., None].astype(jnp.float32)
    ubs_feats = jnp.concatenate([vis_u, rel * vis_u], -1)

    vis_g = (state.d_u2g <= params.r_sns)[..., None].astype(jnp.float32)  # [N, M, 1]
    rel_g = (state.pos_gts[None, :, :] - state.pos_ubs[:, None, :]) / min(
        params.range_pos, params.r_sns)
    inst = jnp.broadcast_to(state.rate_per_gt[None, :, None] / params.max_rate, (N, M, 1))
    cols = [vis_g, rel_g * vis_g, inst * vis_g]
    if params.fair_service:
        avg = state.avg_rate_per_gt[None, :, None] / params.max_rate \
            * params.n_gts / (params.n_ubs * params.n_rbs)
        cols.append(jnp.broadcast_to(avg, (N, M, 1)) * vis_g)
    gt_feats = jnp.concatenate(cols, -1)

    adj = state.d_u2u <= params.r_comm
    return {"agent": own.astype(jnp.float32), "gt": gt_feats.astype(jnp.float32),
            "ubs": ubs_feats.astype(jnp.float32), "adj": adj}


def get_state_vec(params: EnvParams, state: EnvState):
    ubs = (state.pos_ubs / params.range_pos).reshape(-1)
    cols = [state.pos_gts / params.range_pos,
            (state.rate_per_gt / params.max_rate)[:, None]]
    if params.fair_service:
        cols.append((state.avg_rate_per_gt / params.max_rate
                     * params.n_gts / (params.n_ubs * params.n_rbs))[:, None])
    gts = jnp.concatenate(cols, -1).reshape(-1)
    return jnp.concatenate([ubs, gts]).astype(jnp.float32)


def _others_index(n):
    """[n, n-1] int index of all agents except the row agent."""
    idx = np.arange(n)[None, :].repeat(n, 0)
    out = np.empty((n, n - 1), np.int32)
    for i in range(n):
        out[i] = np.delete(idx[i], i)
    return jnp.asarray(out)


def rollout(params: EnvParams, policy_apply, policy_params, state0, h0, key, n_steps,
            eps=0.0):
    """On-device rollout: scan of (policy forward + env step) over time.

    policy_apply(params, obs, h, key) -> (q, h').  Epsilon-greedy with a
    per-step jointly-random draw (reference exploration quirk).
    Returns (final_state, rewards [T, N]).
    """

    def one_step(carry, _):
        state, h, key = carry
        key, k_pol, k_eps, k_rand = jax.random.split(key, 4)
        obs, svec = get_obs(params, state), None
        del svec
        q, h = policy_apply(policy_params, obs, h, k_pol)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_rand, greedy.shape, 0, params.n_actions)
        explore = jax.random.uniform(k_eps) < eps
        acts = jnp.where(explore, rand, greedy)
        state, _, _, rew, done = step(params, state, acts)
        return (state, h, key), rew

    (state, h, _), rews = jax.lax.scan(one_step, (state0, h0, key), None,
                                       length=n_steps)
    return state, rews
