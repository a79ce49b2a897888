"""Fully-fused DRQN training (exp1 fast path): one XLA program per iteration.

Single-agent counterpart of :class:`...madrqn.fused.FusedMadrqnTrainer` on the
jittable single-UBS env: each iteration collects one episode on ``n_worlds``
parallel worlds (policy scan included), slices it into the reference's
``max_seq_len`` replay chunks, writes them into device-resident ring storage,
and runs ``updates_per_iter`` sampled scan-BPTT updates — all in a single
jitted (donated-buffer) call.  Update cadence matches the reference drqn
driver (one update per ``max_seq_len`` env steps; reference
``algos/drqn/run.py:57`` via ``update_every = max_seq_len``).
"""

from types import SimpleNamespace as SN

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect_subs
from uav_bs_ctrl_tpu.algos.common import check_args_sanity
from uav_bs_ctrl_tpu.algos.drqn.config import DEFAULT_CONFIG
from uav_bs_ctrl_tpu.algos.drqn.learner import QLearner
from uav_bs_ctrl_tpu.envs import jax_env_subs


class FusedDrqnTrainer:
    """Device-resident replay + single-program train iterations (exp1)."""

    def __init__(self, env_kwargs=None, train_kwargs=None, n_worlds=8,
                 capacity_chunks=None, updates_per_iter=None, n_layouts=256,
                 seed=0):
        cfg = dict(DEFAULT_CONFIG)
        cfg.update(train_kwargs or {})
        self.args = args = check_args_sanity(SN(**cfg))
        env_kwargs = dict(env_kwargs or {})

        self.env_params = jax_env_subs.make_params(**env_kwargs)
        self.T = self.env_params.episode_limit
        self.L = args.max_seq_len if args.max_seq_len is not None else self.T
        assert self.T % self.L == 0, \
            "episode_limit must be a multiple of max_seq_len"
        self.n_slices = self.T // self.L
        self.n_worlds = n_worlds
        self.chunks_per_iter = n_worlds * self.n_slices
        # Reference cadence: one update per max_seq_len env steps.
        self.updates_per_iter = updates_per_iter or self.chunks_per_iter

        M = self.env_params.n_gts
        if args.agent == "gnn":
            obs_shape = dict(agent=2, gt=4)
        else:
            obs_shape = 2 + M * 4  # sorted-key Dict flatten: agent then gt
        env_info = dict(obs_shape=obs_shape, n_actions=self.env_params.n_actions,
                        episode_limit=self.T)
        self.learner = QLearner(env_info, args, seed=seed)

        capacity = capacity_chunks or args.replay_size
        capacity -= capacity % self.chunks_per_iter
        assert capacity > 0
        self.capacity = capacity

        self.pool = collect_subs.make_subs_layout_pool(n_layouts, seed=seed,
                                                       **env_kwargs)
        self.test_pool = collect_subs.make_subs_layout_pool(
            n_layouts, seed=seed + 10_000, **env_kwargs)
        self.key = jax.random.PRNGKey(seed)

        chunk_shape = jax.eval_shape(
            lambda k: self._collect(self.learner.params, k, jnp.float32(1.0))[0],
            jax.random.PRNGKey(0))
        self.replay = jax.tree_util.tree_map(
            lambda s: jnp.zeros((self.capacity,) + s.shape[1:], s.dtype), chunk_shape)
        self._ptr = 0
        self._size = 0

        self._iter_jit = jax.jit(self._iteration, donate_argnums=(0, 1, 2, 3))
        self._collect_jit = jax.jit(self._collect)

    # ------------------------------------------------------------------ #

    def _agent_apply(self, params, obs, h, k):
        net = params["net"] if "net" in params else params
        if self.args.agent != "gnn":
            lead = obs["agent"].shape[:-1]
            obs = {"agent": jnp.concatenate(
                [obs["agent"], obs["gt"].reshape(lead + (-1,))], axis=-1)}
        return self.learner._apply_net(net, obs, h, k)

    def _collect(self, params, key, eps):
        k_reset, k_ep = jax.random.split(key)
        states = collect_subs.reset_subs_worlds(self.env_params, self.pool,
                                                k_reset, self.n_worlds)
        h0 = jnp.zeros((self.n_worlds, 1, self.args.hidden_size))
        chunks, _, stats = collect_subs.collect_episode_subs(
            self.env_params, self._agent_apply, params, states, h0, self.T,
            self.L, k_ep, eps)
        if self.args.agent != "gnn":
            lead = chunks["obs"]["agent"].shape[:-1]
            chunks["obs"] = {"agent": jnp.concatenate(
                [chunks["obs"]["agent"],
                 chunks["obs"]["gt"].reshape(lead + (-1,))], axis=-1)}
        return chunks, stats

    def _iteration(self, params, target_params, opt_state, replay, key, eps,
                   lr_scale, ptr, size):
        """One fused program: collect episode -> ring write -> K updates."""
        key, k_col = jax.random.split(key)
        chunks, stats = self._collect(params, k_col, eps)

        replay = jax.tree_util.tree_map(
            lambda store, x: jax.lax.dynamic_update_slice_in_dim(store, x, ptr, 0),
            replay, chunks)
        size = jnp.minimum(size + self.chunks_per_iter, self.capacity)

        B = self.learner.batch_size

        def one_update(carry, _):
            params, target_params, opt_state, key = carry
            key, k_idx, k_upd = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (B,), 0, size)
            batch = jax.tree_util.tree_map(lambda store: store[idx], replay)
            params, target_params, opt_state, metrics = self.learner._update_fn(
                params, target_params, opt_state, batch, k_upd, lr_scale)
            return (params, target_params, opt_state, key), metrics["LossQ"]

        (params, target_params, opt_state, _), losses = jax.lax.scan(
            one_update, (params, target_params, opt_state, key), None,
            length=self.updates_per_iter)

        metrics = dict(LossQ=jnp.mean(losses),
                       EpRet=jnp.mean(stats["EpRet"]),
                       FairIdx=jnp.mean(stats["FairIdx"]),
                       AvgGlobalUtility=jnp.mean(stats["AvgGlobalUtility"]))
        return params, target_params, opt_state, replay, metrics, size

    # ------------------------------------------------------------------ #

    def evaluate(self, n_episodes=5, eps=0.05):
        self.key, sub = jax.random.split(self.key)
        stats = collect_subs.evaluate_policy_subs(
            self.env_params, self._agent_apply, self.learner.params,
            self.test_pool, self.args.hidden_size, sub, n_episodes, eps)
        return {k: np.asarray(v) for k, v in stats.items()}

    def run_iteration(self, eps, warmup=False):
        self.key, sub = jax.random.split(self.key)
        if warmup:
            chunks, stats = self._collect_jit(self.learner.params, sub,
                                              jnp.float32(eps))
            self.replay = jax.tree_util.tree_map(
                lambda store, x: jax.lax.dynamic_update_slice_in_dim(
                    store, x, self._ptr, 0), self.replay, chunks)
            self._size = min(self._size + self.chunks_per_iter, self.capacity)
            self._ptr = (self._ptr + self.chunks_per_iter) % self.capacity
            return {k: float(np.mean(np.asarray(v))) for k, v in stats.items()}

        (self.learner.params, self.learner.target_params, self.learner.opt_state,
         self.replay, metrics, _) = self._iter_jit(
            self.learner.params, self.learner.target_params,
            self.learner.opt_state, self.replay, sub, jnp.float32(eps),
            jnp.float32(self.learner.lr_scale), jnp.int32(self._ptr),
            jnp.int32(self._size))
        self._size = min(self._size + self.chunks_per_iter, self.capacity)
        self._ptr = (self._ptr + self.chunks_per_iter) % self.capacity
        return {k: float(v) for k, v in metrics.items()}
