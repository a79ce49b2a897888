"""Vectorized MADRQN training: on-device rollouts over parallel worlds.

The fast path beyond the reference architecture: instead of the host-driven
step loop (one ``act`` dispatch + one NumPy env step per timestep), each
iteration runs ONE device program that rolls a full episode on ``n_worlds``
parallel env instances (``algos.collect.collect_chunk``: vmapped jittable env
+ policy scan), then pushes the resulting chunk batch into the replay buffer
with a single transfer and runs ``updates_per_chunk`` jitted updates.

Equivalences to the classic driver (``algos/madrqn/run.py``):
- epsilon schedule is driven by total env steps (worlds x steps);
- update-to-data ratio matches the reference cadence (one update per
  ``max_seq_len`` env steps) by default;
- logging schema (progress.txt columns) is a superset: adds EnvStepsPerSec.

Restrictions of this path (by construction): ``max_seq_len`` must equal
``episode_limit`` (chunk = episode, as in every reference madrqn experiment),
and comm protocols/encoders are whatever the agent supports — the policy runs
inside the collection scan.
"""

import copy
import os.path as osp
import time
from types import SimpleNamespace as SN

import numpy as np

import jax
import jax.numpy as jnp

from uav_bs_ctrl_tpu.algos import collect
from uav_bs_ctrl_tpu.algos.common import check_args_sanity, set_rand_seed
from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner
from uav_bs_ctrl_tpu.envs import jax_env
from uav_bs_ctrl_tpu.utils.logx import EpochLogger
from uav_bs_ctrl_tpu.utils.profiling import StepTimer


def train_vectorized(map_id, seed=0, train_kwargs=dict(), logger_kwargs=dict(),
                     n_worlds=32, n_layouts=256, fair_service=True,
                     avoid_collision=True, updates_per_chunk=None):
    """Train MADRQN with on-device vectorized collection on ``map_id``."""

    logger = EpochLogger(**logger_kwargs)
    set_rand_seed(seed)

    config = copy.deepcopy(DEFAULT_CONFIG)
    config.update(train_kwargs)
    args = SN(**config)
    args = check_args_sanity(args)
    logger.save_config(dict(map_id=map_id, seed=seed, n_worlds=n_worlds,
                            args=vars(args)))

    env_params = jax_env.make_params(map_id, fair_service=fair_service,
                                     avoid_collision=avoid_collision)
    T = env_params.episode_limit
    assert args.max_seq_len in (None, T), \
        "vectorized path requires chunk == episode (max_seq_len=None)"
    args.max_seq_len = None

    # Env info mirrors the wrapper's (feature dims exclude the flag column
    # for the gnn path; flat dim includes everything for the mlp path).
    nf_gt = 4 + (1 if fair_service else 0)
    if args.o == "gnn":
        obs_shape = dict(agent=2, gt=nf_gt - 1, ubs=2)
    else:
        obs_shape = (2 + env_params.n_gts * nf_gt + (env_params.n_ubs - 1) * 3)
    env_info = dict(
        obs_shape=obs_shape,
        state_shape=env_params.n_ubs * 2 + env_params.n_gts * (3 + (1 if fair_service else 0)),
        n_actions=env_params.n_actions, n_agents=env_params.n_ubs,
        episode_limit=T)
    learner = MultiAgentQLearner(env_info, args, seed=seed)

    pool = collect.make_layout_pool(map_id, n_layouts, seed=seed)
    test_pool = collect.make_layout_pool(map_id, n_layouts, seed=seed + 10_000)
    key = jax.random.PRNGKey(seed)

    total_steps = args.steps_per_epoch * args.epochs
    steps_per_chunk = n_worlds * T
    n_chunks = max(1, total_steps // steps_per_chunk)
    chunks_per_epoch = max(1, args.steps_per_epoch // steps_per_chunk)
    if updates_per_chunk is None:
        # Reference cadence: one update per max_seq_len env steps.
        updates_per_chunk = max(1, n_worlds)

    eps_start, eps_end = 1, 0.05
    eps_thres = lambda t: max(eps_end, -(eps_start - eps_end) / args.decay_steps * t + eps_start)

    share_reward = getattr(args, "share_reward", False)
    timer = StepTimer()
    start_time = time.time()
    t_global = 0

    def flatten_obs(obs):
        # Flatten to the gym sorted-key order (agent, gt, ubs) that the dense
        # encoder was built for; 'adj' rides along for comm protocols.
        lead = obs["agent"].shape[:-1]
        flat = jnp.concatenate([
            obs["agent"],
            obs["gt"].reshape(lead + (-1,)),
            obs["ubs"].reshape(lead + (-1,)),
        ], axis=-1)
        return {"agent": flat, "adj": obs["adj"]}

    def agent_apply(params, obs, h, k):
        net = params["net"] if "net" in params else params
        if args.o == "mlp":
            obs = flatten_obs(obs)
        return learner._apply_net(net, obs, h, k)

    for it in range(n_chunks):
        key, k_reset, k_chunk = jax.random.split(key, 3)
        with timer.phase('Collect'):
            states = collect.reset_worlds(env_params, pool, k_reset, n_worlds)
            h0 = jnp.zeros((n_worlds, env_params.n_ubs, args.hidden_size))
            chunk, states_f, stats = collect.collect_chunk(
                env_params, agent_apply, learner.params, states, h0, T, k_chunk,
                jnp.float32(eps_thres(t_global)))
            stats = {k: np.asarray(v) for k, v in stats.items()}

        with timer.phase('Push'):
            if args.o == "mlp":
                chunk["obs"] = flatten_obs(chunk["obs"])
            chunk = jax.tree_util.tree_map(np.asarray, chunk)
            if share_reward:
                chunk["rew"] = chunk["rew"].mean(-1, keepdims=True)
            learner.buffer.push_chunks(chunk)

        t_global += steps_per_chunk

        n_upd = updates_per_chunk if len(learner.buffer) >= learner.batch_size else 0
        for _ in range(n_upd):
            with timer.phase('Update'):
                diagnostic = learner.update()
            logger.store(**diagnostic)

        logger.store(EpRet=stats["EpRet"].mean(),
                     AvgGlobalUtility=stats["AvgGlobalUtility"].mean(),
                     FairIdx=stats["FairIdx"].mean(),
                     TotalThroughput=stats["TotalThroughput"].mean(),
                     ProbCollision=stats["ProbCollision"].mean())

        if (it + 1) % chunks_per_epoch == 0:
            epoch = (it + 1) // chunks_per_epoch

            # On-device test episodes (greedy, eps=0.05 — the reference
            # test_agent semantics) on held-out layouts.
            key, k_test = jax.random.split(key)
            test_stats = collect.evaluate_policy(
                env_params, agent_apply, learner.params, test_pool,
                args.hidden_size, k_test, args.num_test_episodes)
            logger.store(**{k: np.asarray(v) for k, v in test_stats.items()})

            learner.step_lr_scheduler()
            if (epoch % args.save_freq == 0) or (it + 1 == n_chunks):
                save_path = osp.join(logger.output_dir or '/tmp',
                                     f'checkpoint_epoch{epoch}.pt')
                learner.save_checkpoint(save_path, stamp=dict(epoch=epoch, t=t_global))

            times = timer.flush()
            collect_ms = times.get('TimeCollectMs', 1.0)
            logger.log_tabular('Epoch', epoch)
            logger.log_tabular('EpRet', with_min_and_max=True)
            logger.log_tabular('AvgGlobalUtility', average_only=True)
            logger.log_tabular('FairIdx', average_only=True)
            logger.log_tabular('TotalThroughput', average_only=True)
            logger.log_tabular('ProbCollision', average_only=True)
            logger.log_tabular('TestEpRet', with_min_and_max=True)
            logger.log_tabular('TestFairIdx', average_only=True)
            logger.log_tabular('TestAvgGlobalUtility', average_only=True)
            logger.log_tabular('TestTotalThroughput', average_only=True)
            logger.log_tabular('TestProbCollision', average_only=True)
            logger.log_tabular('TotalEnvInteracts', t_global)
            logger.log_tabular('LossQ', average_only=True)
            logger.log_tabular('TimeCollectMs', collect_ms)
            logger.log_tabular('TimeUpdateMs', times.get('TimeUpdateMs', 0.0))
            logger.log_tabular('EnvStepsPerSec', steps_per_chunk / (collect_ms / 1e3))
            logger.log_tabular('Time', time.time() - start_time)
            logger.dump_tabular()

    print("Complete.")
    return learner
