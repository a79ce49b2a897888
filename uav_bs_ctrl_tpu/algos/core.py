"""Recurrent Q-learning core: jitted acting and one-program BPTT updates.

TPU-first redesign of the reference learners (``algos/drqn/learner.py``,
``algos/madrqn/learner.py``): where the reference runs a Python loop of
per-timestep GNN forwards and lets autograd unroll BPTT (reference
``madrqn/learner.py:118-129``), here the ENTIRE update — policy and target
unrolls over time (``jax.lax.scan``), action gather, double-Q target, QMIX
mixing, MSE loss, gradient value-clipping, AdamW step, and Polyak target
averaging — is one jitted XLA program.  Forward and backward fuse; nothing
crosses the host boundary except the sampled batch.

Exact reference semantics preserved:
- TD target ``r + gamma * (1 - done) * V_next`` with plain-max or double-Q
  ``V_next`` (``madrqn/learner.py:134-140``).
- QMIX mixes per-agent Q into q_tot with states at t (policy) / t+1 (target)
  (``:144-148``); shared reward = mean of local rewards (``:83-84``).
- Gradient VALUE clip at 1 applied to the policy net only — the reference
  clips ``policy_net.parameters()`` and leaves mixer gradients unclipped
  (``:159``).
- Polyak averaging of both net and mixer targets (``:162-171``).
- Epsilon-greedy exploration is JOINT: one host-side draw decides whether all
  agents act greedily or all act randomly (``:75-78``, SURVEY.md quirk 3).
- Stored hidden states seed BPTT (no burn-in); ``next_h`` is zeroed at episode
  end by the caller (``run.py`` via ``cache``).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from uav_bs_ctrl_tpu.algos.buffer import SequenceReplayBuffer
from uav_bs_ctrl_tpu.models.heads import QMixer
from uav_bs_ctrl_tpu.utils import checkpoint as ckpt_io


def _tree_copy(tree):
    return jax.tree_util.tree_map(jnp.array, tree)


def _to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def cast_floating(tree, dtype):
    """Cast the floating leaves of a pytree (masks/indices pass through)."""
    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map(cast, tree)


class RecurrentQLearner:
    """Shared core for DRQN (n_agents=1) and MADRQN (with mixer/double-Q)."""

    def __init__(self, env_info, args, agent, seed=0):
        self.args = args
        self.agent = agent
        self.n_agents = env_info.get("n_agents", 1)
        self.n_actions = env_info["n_actions"]
        self.state_shape = env_info.get("state_shape")
        self.max_seq_len = (args.max_seq_len if args.max_seq_len is not None
                            else env_info["episode_limit"])
        self.gamma = args.gamma
        self.polyak = args.polyak
        self.batch_size = args.batch_size
        self.double_q = getattr(args, "double_q", False)
        self.use_mixer = bool(getattr(args, "mixer", False))
        # Mixed precision: bf16 network compute (MXU-native on TPU) with f32
        # master params, f32 loss/optimizer/Polyak, f32 scan carries.  The
        # mixer hypernetwork stays f32 (tiny, and its abs-weights are
        # precision-sensitive).
        self.compute_dtype = (jnp.bfloat16
                              if getattr(args, "compute_dtype", "float32") == "bfloat16"
                              else jnp.float32)
        # BPTT schedule: 'per_step' scans full agent.apply per timestep;
        # 'hoisted' batches the h-independent encoder over all timesteps and
        # scans only the recurrent part (identical math; see _loss_fn).
        self.bptt_encoder = getattr(args, "bptt_encoder", "per_step")
        assert self.bptt_encoder in ("per_step", "hoisted", "merged"), \
            self.bptt_encoder
        # lax.scan unroll factor for the BPTT unrolls: the flagship update is
        # latency-bound on per-step launch/fusion boundaries (hardware A/B in
        # benchmarks/RESULTS.md), and unrolling lets XLA fuse and pipeline
        # across timesteps.  1 = plain scan.
        self.bptt_unroll = int(getattr(args, "bptt_unroll", 1))

        key = jax.random.PRNGKey(seed)
        key, k_net, k_mix = jax.random.split(key, 3)
        self._key = key

        self.params = {"net": self.agent.init(k_net)}
        self.mixer = None
        if self.use_mixer:
            assert self.state_shape is not None, "QMIX requires a global state."
            self.mixer = QMixer(self.state_shape, self.n_agents, args)
            self.params["mixer"] = self.mixer.init(k_mix)
        self.target_params = _tree_copy(self.params)

        self.buffer = SequenceReplayBuffer(args.replay_size, self.max_seq_len)

        self.lr = args.lr
        self.anneal_lr = getattr(args, "anneal_lr", False)
        self.lr_scale = 1.0
        self._epoch = 0
        # torch AdamW defaults: betas (0.9, 0.999), eps 1e-8, weight_decay 0.01.
        self.optimizer = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.lr, weight_decay=0.01)
        self.opt_state = self.optimizer.init(self.params)

        self._act_jit = jax.jit(self._act_fn)
        self._update_jit = jax.jit(self._update_fn, donate_argnums=(0, 1, 2))
        # Batch placement hook; the parallel layer overrides this to shard
        # sampled batches across the device mesh (see parallel.mesh).
        self._batch_to_device = _to_device

    # ------------------------------------------------------------------ #
    # Acting

    def init_hidden(self, batch_size=1):
        h = np.zeros((self.n_agents * batch_size, self.agent.hidden), dtype=np.float32)
        return h.reshape(batch_size, self.n_agents, -1).squeeze(0) if batch_size == 1 else h

    def _apply_net(self, net_params, obs, h, key):
        """Agent forward at ``compute_dtype``; q/h returned in f32.

        Keeping the returned hidden state f32 preserves scan-carry dtype
        stability (collection and BPTT both scan over ``h``); the cast pairs
        at the boundary are fused by XLA and the matmul/GRU work runs bf16.
        """
        if self.compute_dtype == jnp.float32:
            return self.agent.apply(net_params, obs, h, key)
        q, h2 = self.agent.apply(cast_floating(net_params, self.compute_dtype),
                                 cast_floating(obs, self.compute_dtype),
                                 h.astype(self.compute_dtype), key)
        return q.astype(jnp.float32), h2.astype(jnp.float32)

    def _act_fn(self, params, obs, h, key):
        q, h2 = self._apply_net(params["net"], obs, h, key)
        return jnp.argmax(q, axis=-1), h2

    def act(self, obs, h, eps_thres):
        """Joint epsilon-greedy action selection (reference quirk 3)."""
        self._key, sub = jax.random.split(self._key)
        greedy, h2 = self._act_jit(self.params, _to_device(obs), jnp.asarray(h), sub)
        if np.random.random() > eps_thres:
            acts = np.asarray(greedy)
        else:
            acts = np.random.randint(self.n_actions, size=(self.n_agents,))
        return acts.tolist(), np.asarray(h2)

    # ------------------------------------------------------------------ #
    # Experience

    def cache(self, obs, h, state, act, rew, next_obs, next_h, next_state, done, bad_mask):
        rew = np.asarray(rew, dtype=np.float32).reshape(-1)
        if getattr(self.args, "share_reward", False):
            rew = rew.mean(keepdims=True)

        transition = dict(
            obs=obs, h=np.asarray(h, np.float32),
            act=np.asarray(act, np.int32).reshape(-1),
            rew=rew,
            done=np.float32((1 - bad_mask) * done),
            next_obs=next_obs, next_h=np.asarray((1 - done) * next_h, np.float32),
        )
        if state is not None:
            transition["state"] = np.asarray(state, np.float32)
            transition["next_state"] = np.asarray(next_state, np.float32)
        self.buffer.push(transition)

    # ------------------------------------------------------------------ #
    # Update

    def _loss_fn(self, params, target_params, batch, key):
        T = self.max_seq_len
        # Time-major views: leaves [T(+1), B, ...].
        obs = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 1, 0), batch["obs"])
        acts = jnp.moveaxis(batch["act"], 1, 0).astype(jnp.int32)     # [T, B, A]
        rews = jnp.moveaxis(batch["rew"], 1, 0)                       # [T, B, R]
        dones = jnp.moveaxis(batch["done"], 1, 0)[..., None]          # [T, B, 1]
        h0 = batch["h"][:, 0]
        h_targ0 = batch["h"][:, 1]

        # Mixed precision: the entire BPTT unroll (params, obs sequence, scan
        # carry) runs at compute_dtype; Q stacks are cast back to f32 once, so
        # gather/double-Q/mixer/MSE and the optimizer stay full precision.
        cdt = self.compute_dtype
        net_p = cast_floating(params["net"], cdt)
        net_t = cast_floating(target_params["net"], cdt)
        obs = cast_floating(obs, cdt)

        if self.bptt_encoder == "hoisted":
            # Hoist the h-independent observation encoder out of the
            # sequential unrolls: one batched call over ALL T+1 timesteps
            # (leading dims [T+1, B] flow straight through the masked-
            # attention/MLP encoders), so the dominant GATv2 work runs as a
            # single large MXU program instead of T+1 small per-step calls.
            # Only the recurrent comm/GRU/head (``agent.step``) stays inside
            # the scan.  Math and per-step RNG threading are identical to the
            # per-step path (regression-pinned in tests/test_learner.py);
            # which schedule is faster is hardware-dependent — large batched
            # contractions win on the MXU, the per-step path's smaller
            # working set wins on cache-based hosts.
            adj = obs.get("adj") if isinstance(obs, dict) else None
            obs_next = jax.tree_util.tree_map(lambda v: v[1:], obs)
            x_pol = self.agent.encode(net_p, obs)                     # [T+1, B, A, H]
            x_targ = self.agent.encode(net_t, obs_next)               # [T, B, A, H]

            def unroll(x_seq, adj_seq, h_init, k, p):
                def step(carry, inp):
                    h, k = carry
                    k, sub = jax.random.split(k)
                    q, h = self.agent.step(p, inp["x"], inp.get("adj"), h, sub)
                    return (h, k), q

                xs = {"x": x_seq}
                if adj_seq is not None:
                    xs["adj"] = adj_seq
                (_, _), q_seq = jax.lax.scan(step, (h_init.astype(cdt), k), xs,
                                             unroll=self.bptt_unroll)
                return q_seq

            key_pol, key_targ = jax.random.split(key)
            agent_out = unroll(x_pol, adj, h0, key_pol, net_p)        # [T+1, B, A, n_act]
            adj_next = None if adj is None else adj[1:]
            target_out = unroll(x_targ, adj_next, h_targ0, key_targ, net_t)
        elif self.bptt_encoder == "merged":
            # Merge the policy and target unrolls into ONE scan with the two
            # networks stacked on a leading axis (vmapped apply): the update
            # is latency-bound on its sequential kernel chain (hardware A/Bs
            # in RESULTS.md: neither hoisting the encoder nor scan unrolling
            # helps), so halve the number of sequential steps — T+1 instead
            # of (T+1)+T — and double per-kernel work at unchanged kernel
            # count.  The target slice processes obs[t+1] at step t (its
            # final step re-processes obs[T] and is dropped); per-net RNG
            # chains match the two-scan schedule exactly.
            stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                             net_p, net_t)
            obs_tgt = jax.tree_util.tree_map(
                lambda v: jnp.concatenate([v[1:], v[-1:]], axis=0), obs)
            obs_stack = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b], axis=1), obs, obs_tgt)  # [T+1, 2, ...]
            h_stack = jnp.stack([h0.astype(cdt), h_targ0.astype(cdt)])

            vapply = jax.vmap(self.agent.apply)

            def both_step(carry, obs_t):
                h, k_pol, k_tgt = carry
                k_pol, sub_p = jax.random.split(k_pol)
                k_tgt, sub_t = jax.random.split(k_tgt)
                q, h = vapply(stacked, obs_t, h, jnp.stack([sub_p, sub_t]))
                return (h, k_pol, k_tgt), q

            key_pol, key_targ = jax.random.split(key)
            _, q_seq = jax.lax.scan(
                both_step, (h_stack, key_pol, key_targ), obs_stack,
                unroll=self.bptt_unroll)                              # [T+1, 2, B, A, n_act]
            agent_out = q_seq[:, 0]
            target_out = q_seq[:T, 1]
        else:
            def pol_step(carry, obs_t):
                h, k = carry
                k, sub = jax.random.split(k)
                q, h = self.agent.apply(net_p, obs_t, h, sub)
                return (h, k), q

            key_pol, key_targ = jax.random.split(key)
            (_, _), agent_out = jax.lax.scan(
                pol_step, (h0.astype(cdt), key_pol), obs,
                unroll=self.bptt_unroll)                              # [T+1, B, A, n_act]

            def targ_step(carry, obs_t):
                h, k = carry
                k, sub = jax.random.split(k)
                q, h = self.agent.apply(net_t, obs_t, h, sub)
                return (h, k), q

            obs_next = jax.tree_util.tree_map(lambda x: x[1:], obs)
            (_, _), target_out = jax.lax.scan(
                targ_step, (h_targ0.astype(cdt), key_targ), obs_next,
                unroll=self.bptt_unroll)

        agent_out = agent_out.astype(jnp.float32)
        target_out = jax.lax.stop_gradient(target_out).astype(jnp.float32)  # [T, B, A, n_act]

        qvals = jnp.take_along_axis(agent_out[:T], acts[..., None], axis=-1)[..., 0]
        if self.double_q:
            next_acts = jnp.argmax(jax.lax.stop_gradient(agent_out[1:]), axis=-1)
            next_vals = jnp.take_along_axis(target_out, next_acts[..., None], axis=-1)[..., 0]
        else:
            next_vals = jnp.max(target_out, axis=-1)

        if self.mixer is not None:
            states = jnp.moveaxis(batch["state"], 1, 0)               # [T+1, B, ds]
            qvals = self.mixer.apply(params["mixer"], qvals, states[:T])
            next_vals = jax.lax.stop_gradient(
                self.mixer.apply(target_params["mixer"], next_vals, states[1:]))

        target_q = rews + self.gamma * (1.0 - dones) * next_vals
        target_q = jnp.broadcast_to(jax.lax.stop_gradient(target_q), qvals.shape)
        loss = jnp.mean(jnp.square(qvals - target_q))
        return loss, qvals

    def _update_fn(self, params, target_params, opt_state, batch, key, lr_scale):
        (loss, qvals), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            params, target_params, batch, key)

        # Value-clip the policy-net gradients only (reference clips
        # policy_net.parameters(); mixer grads pass through unclipped).
        grads["net"] = jax.tree_util.tree_map(lambda g: jnp.clip(g, -1.0, 1.0), grads["net"])

        opt_state.hyperparams["learning_rate"] = self.lr * lr_scale
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        target_params = jax.tree_util.tree_map(
            lambda t, p: self.polyak * t + (1.0 - self.polyak) * p, target_params, params)

        metrics = dict(LossQ=loss, QVals=jnp.mean(qvals))
        return params, target_params, opt_state, metrics

    def update(self):
        assert len(self.buffer) >= self.batch_size, "Insufficient samples for update."
        batch = self._batch_to_device(self.buffer.sample(self.batch_size))
        self._key, sub = jax.random.split(self._key)
        self.params, self.target_params, self.opt_state, metrics = self._update_jit(
            self.params, self.target_params, self.opt_state, batch, sub,
            jnp.float32(self.lr_scale))
        return {k: float(v) for k, v in metrics.items()}

    def step_lr_scheduler(self):
        """Epoch-stepped LambdaLR: scale = max(0.4, 1 - epoch/100)."""
        self._epoch += 1
        if self.anneal_lr:
            self.lr_scale = max(0.4, 1.0 - self._epoch / 100)

    # ------------------------------------------------------------------ #
    # Checkpointing

    def save_checkpoint(self, path, stamp):
        """Persist model/optimizer state (pickle ``.pt`` or Orbax directory)."""
        checkpoint = dict(stamp)
        checkpoint["model_state_dict"] = self.params["net"]
        checkpoint["optimizer_state_dict"] = self.opt_state
        if self.mixer is not None:
            checkpoint["mixer_state_dict"] = self.params["mixer"]
        if self.anneal_lr:
            checkpoint["lr_scheduler_state_dict"] = dict(epoch=self._epoch,
                                                         lr_scale=self.lr_scale)
        ckpt_io.save(path, checkpoint)
        print(f"Save checkpoint to {path}.")

    def load_checkpoint(self, path):
        checkpoint = ckpt_io.load(path)
        stamp = dict(epoch=checkpoint["epoch"], t=checkpoint["t"])
        self.params["net"] = _to_device(checkpoint["model_state_dict"])
        if self.mixer is not None:
            self.params["mixer"] = _to_device(checkpoint["mixer_state_dict"])
        self.target_params = _tree_copy(self.params)
        self.opt_state = jax.tree_util.tree_map(
            jnp.asarray, checkpoint["optimizer_state_dict"],
            is_leaf=lambda x: isinstance(x, np.ndarray))
        if self.anneal_lr and "lr_scheduler_state_dict" in checkpoint:
            self._epoch = checkpoint["lr_scheduler_state_dict"]["epoch"]
            self.lr_scale = checkpoint["lr_scheduler_state_dict"]["lr_scale"]
        print(f"Load checkpoint from {path}.")
        return stamp
