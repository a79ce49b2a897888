"""Fully-fused MADRQN training: one XLA program per training iteration.

The end point of the TPU-first redesign: each iteration executes — entirely on
device, in a single jitted (donated-buffer) call —

  1. vectorized collection of one episode chunk on ``n_worlds`` parallel
     jittable envs (policy scan included),
  2. the replay-ring WRITE (``dynamic_update_slice`` into device-resident
     storage),
  3. ``updates_per_iter`` training updates, each sampling its own batch from
     the device replay (scan-BPTT, double-Q, optional QMIX, AdamW, Polyak).

The host's only jobs are scheduling (epsilon/LR scalars), logging, and
checkpointing.  Contrast with the reference architecture (host-driven NumPy
env stepping + per-step model dispatch + host replay): there is no per-step
or even per-update host boundary left.

Memory: device replay for exp2-class maps is tens of MB; for exp3 '8ubs'
(~2 GB at the reference's 5000-chunk capacity) pass a smaller
``capacity_chunks`` or use the host-replay path (``vec_run``).
"""

from functools import partial
from types import SimpleNamespace as SN

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect
from uav_bs_ctrl_tpu.algos.common import check_args_sanity
from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
from uav_bs_ctrl_tpu.envs import jax_env


class FusedMadrqnTrainer:
    """Device-resident replay + single-program train iterations."""

    def __init__(self, map_id, train_kwargs=None, n_worlds=16, capacity_chunks=256,
                 updates_per_iter=None, n_layouts=64, seed=0, fair_service=True,
                 avoid_collision=True, interleave=1, mesh=None):
        cfg = dict(DEFAULT_CONFIG)
        cfg.update(train_kwargs or {})
        self.args = args = check_args_sanity(SN(**cfg))

        self.env_params = jax_env.make_params(map_id, fair_service=fair_service,
                                              avoid_collision=avoid_collision)
        self.T = self.env_params.episode_limit
        args.max_seq_len = None  # chunk == episode

        assert capacity_chunks % n_worlds == 0, \
            "capacity_chunks must be a multiple of n_worlds (ring write stride)"
        self.n_worlds = n_worlds
        self.capacity = capacity_chunks
        self.updates_per_iter = updates_per_iter or n_worlds
        # Policy-iteration granularity: one fused program still collects
        # n_worlds episodes and runs updates_per_iter updates, but as
        # ``interleave`` sub-iterations of [collect n_worlds/S episodes ->
        # K/S updates].  The reference's host loop interleaves at 1-episode
        # grain (collect 1 -> update 1); large monolithic iterations cycle
        # the policy-improvement loop S x more coarsely, which measurably
        # delays exp3 learning takeoff.
        assert n_worlds % interleave == 0 and self.updates_per_iter % interleave == 0, \
            "interleave must divide n_worlds and updates_per_iter"
        self.interleave = interleave

        nf_gt = 4 + (1 if fair_service else 0)
        if args.o == "gnn":
            obs_shape = dict(agent=2, gt=nf_gt - 1, ubs=2)
        else:
            obs_shape = 2 + self.env_params.n_gts * nf_gt + (self.env_params.n_ubs - 1) * 3
        env_info = dict(
            obs_shape=obs_shape,
            state_shape=self.env_params.n_ubs * 2
            + self.env_params.n_gts * (3 + (1 if fair_service else 0)),
            n_actions=self.env_params.n_actions, n_agents=self.env_params.n_ubs,
            episode_limit=self.T)
        self.learner = MultiAgentQLearner(env_info, args, seed=seed)

        self.pool = collect.make_layout_pool(map_id, n_layouts, seed=seed)
        self.test_pool = collect.make_layout_pool(map_id, n_layouts, seed=seed + 10_000)
        self.key = jax.random.PRNGKey(seed)

        self._share_reward = bool(getattr(args, "share_reward", False))

        # Allocate device replay storage from the collection output shapes.
        chunk_shape = jax.eval_shape(
            lambda k: self._collect(self.learner.params, k, jnp.float32(1.0))[0],
            jax.random.PRNGKey(0))
        self.replay = jax.tree_util.tree_map(
            lambda s: jnp.zeros((self.capacity,) + s.shape[1:], s.dtype), chunk_shape)
        self._ptr = 0
        self._size = 0

        # Multi-chip: shard the ENTIRE fused loop over the mesh's 'dp' axis —
        # the world axis of collection (vmapped envs + policy forwards run
        # shard-local) and the chunk axis of the device replay ring.  Params/
        # optimizer state replicate; XLA's SPMD partitioner inserts the
        # gradient all-reduce inside the update and the (tiny) gathers for
        # cross-shard batch sampling.  This extends the multi-chip story from
        # the bare update (parallel/mesh.distribute_learner) to the full
        # collection -> ring-write -> update program.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = mesh.shape["dp"]
            assert n_worlds % dp == 0, \
                f"n_worlds={n_worlds} must be divisible by the dp axis size ({dp})"
            assert self.capacity % dp == 0, \
                f"capacity_chunks={self.capacity} must be divisible by the dp axis size ({dp})"
            shard0 = lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*(("dp",) + (None,) * (x.ndim - 1)))))
            repl = lambda x: jax.device_put(x, NamedSharding(mesh, P())) \
                if hasattr(x, "ndim") else x
            self.replay = jax.tree_util.tree_map(shard0, self.replay)
            self.learner.params = jax.tree_util.tree_map(repl, self.learner.params)
            self.learner.target_params = jax.tree_util.tree_map(
                repl, self.learner.target_params)
            self.learner.opt_state = jax.tree_util.tree_map(
                repl, self.learner.opt_state)

        self._iter_jit = jax.jit(self._iteration, donate_argnums=(0, 1, 2, 3))
        self._collect_jit = jax.jit(self._collect)

    # ------------------------------------------------------------------ #

    def _agent_apply(self, params, obs, h, k):
        net = params["net"] if "net" in params else params
        if self.args.o == "mlp":
            lead = obs["agent"].shape[:-1]
            flat = jnp.concatenate([obs["agent"],
                                    obs["gt"].reshape(lead + (-1,)),
                                    obs["ubs"].reshape(lead + (-1,))], axis=-1)
            obs = {"agent": flat, "adj": obs["adj"]}
        return self.learner._apply_net(net, obs, h, k)

    def _collect(self, params, key, eps, n_worlds=None):
        n_worlds = n_worlds or self.n_worlds
        k_reset, k_chunk = jax.random.split(key)
        states = collect.reset_worlds(self.env_params, self.pool, k_reset, n_worlds)
        h0 = jnp.zeros((n_worlds, self.env_params.n_ubs, self.args.hidden_size))
        chunk, _, stats = collect.collect_chunk(
            self.env_params, self._agent_apply, params, states, h0, self.T,
            k_chunk, eps)
        if self.args.o == "mlp":
            lead = chunk["obs"]["agent"].shape[:-1]
            flat = jnp.concatenate([chunk["obs"]["agent"],
                                    chunk["obs"]["gt"].reshape(lead + (-1,)),
                                    chunk["obs"]["ubs"].reshape(lead + (-1,))], -1)
            chunk["obs"] = {"agent": flat, "adj": chunk["obs"]["adj"]}
        if self._share_reward:
            chunk["rew"] = chunk["rew"].mean(-1, keepdims=True)
        return chunk, stats

    def _iteration(self, params, target_params, opt_state, replay, key, eps,
                   lr_scale, ptr, size):
        """One fused program: S x [collect -> ring write -> K/S updates].

        ``interleave=1`` reproduces the original monolithic iteration; larger
        S tightens the collect/update feedback loop toward the reference's
        1-episode grain while keeping everything in a single XLA program.
        """
        B = self.learner.batch_size
        S = self.interleave
        sub_worlds = self.n_worlds // S
        k_sub = self.updates_per_iter // S

        def sub_iter(carry, _):
            params, target_params, opt_state, replay, key, ptr, size = carry
            key, k_col = jax.random.split(key)
            chunk, stats = self._collect(params, k_col, eps, n_worlds=sub_worlds)

            replay = jax.tree_util.tree_map(
                lambda store, x: jax.lax.dynamic_update_slice_in_dim(
                    store, x, ptr, 0), replay, chunk)
            size = jnp.minimum(size + sub_worlds, self.capacity)
            ptr = (ptr + sub_worlds) % self.capacity

            def one_update(carry, _):
                params, target_params, opt_state, key = carry
                key, k_idx, k_upd = jax.random.split(key, 3)
                idx = jax.random.randint(k_idx, (B,), 0, size)
                batch = jax.tree_util.tree_map(lambda store: store[idx], replay)
                params, target_params, opt_state, metrics = self.learner._update_fn(
                    params, target_params, opt_state, batch, k_upd, lr_scale)
                return (params, target_params, opt_state, key), metrics["LossQ"]

            (params, target_params, opt_state, key), losses = jax.lax.scan(
                one_update, (params, target_params, opt_state, key), None,
                length=k_sub)
            return ((params, target_params, opt_state, replay, key, ptr, size),
                    (losses, stats))

        carry0 = (params, target_params, opt_state, replay, key, ptr, size)
        carry, (losses, stats) = jax.lax.scan(sub_iter, carry0, None, length=S)
        params, target_params, opt_state, replay, _, _, size = carry

        metrics = dict(LossQ=jnp.mean(losses),
                       EpRet=jnp.mean(stats["EpRet"]),
                       FairIdx=jnp.mean(stats["FairIdx"]),
                       AvgGlobalUtility=jnp.mean(stats["AvgGlobalUtility"]))
        return params, target_params, opt_state, replay, metrics, size

    # ------------------------------------------------------------------ #

    def evaluate(self, n_episodes=8, eps=0.05):
        """On-device test episodes on held-out layouts (reference test_agent)."""
        self.key, sub = jax.random.split(self.key)
        stats = collect.evaluate_policy(
            self.env_params, self._agent_apply, self.learner.params,
            self.test_pool, self.args.hidden_size, sub, n_episodes, eps)
        return {k: np.asarray(v) for k, v in stats.items()}

    def run_iteration(self, eps, warmup=False):
        """Execute one fused iteration; returns host-side metric floats.

        ``warmup=True`` collects into the replay without updating (used until
        the buffer holds at least one batch).
        """
        self.key, sub = jax.random.split(self.key)
        if warmup:
            chunk, stats = self._collect_jit(self.learner.params, sub,
                                             jnp.float32(eps))
            self.replay = jax.tree_util.tree_map(
                lambda store, x: jax.lax.dynamic_update_slice_in_dim(
                    store, x, self._ptr, 0), self.replay, chunk)
            self._size = min(self._size + self.n_worlds, self.capacity)
            self._ptr = (self._ptr + self.n_worlds) % self.capacity
            return {k: float(np.mean(np.asarray(v))) for k, v in stats.items()}

        (self.learner.params, self.learner.target_params, self.learner.opt_state,
         self.replay, metrics, _) = self._iter_jit(
            self.learner.params, self.learner.target_params,
            self.learner.opt_state, self.replay, sub, jnp.float32(eps),
            jnp.float32(self.learner.lr_scale), jnp.int32(self._ptr),
            jnp.int32(self._size))
        self._size = min(self._size + self.n_worlds, self.capacity)
        self._ptr = (self._ptr + self.n_worlds) % self.capacity
        return {k: float(v) for k, v in metrics.items()}
