r"""Fast-path experiment driver: exp1/exp2/exp3 variants on the fused trainers.

Runs the reference's training configurations (same hyperparameters as
``run_exp1.py`` / ``run_exp2.py`` / ``run_exp3.py``) at FULL budget on one
chip via the fused trainers (``FusedMadrqnTrainer`` / ``FusedDrqnTrainer``) —
on-device collection, device-resident replay, and K sampled updates per
iteration in a single XLA program.  Update-to-data cadence matches the
reference (one update per ``max_seq_len`` env steps); epsilon/LR schedules,
eval episodes, checkpoints, and progress.txt logging mirror the classic
driver (reference ``algos/madrqn/run.py:22-129``, ``algos/drqn/run.py``).

Usage:
    python run_fast.py --exp exp1 --n-grps 2 --agent gnn --seed 10
    python run_fast.py --exp exp2 --map r400 --c tarmac --seed 0
    python run_fast.py --exp exp3 --map 4ubs --c disc --mixer --seed 10
"""

import argparse
import os
import os.path as osp
import sys
import time

from uav_bs_ctrl_tpu.algos.drqn.fused import FusedDrqnTrainer
from uav_bs_ctrl_tpu.algos.madrqn.fused import FusedMadrqnTrainer
from uav_bs_ctrl_tpu.utils.logx import EpochLogger
from uav_bs_ctrl_tpu.utils.run_utils import setup_logger_kwargs

# Reference grid hyperparameters (run_exp1.py / run_exp2.py / run_exp3.py).
EXP1_PRESET = dict(agent="rnn", lr=5e-4, polyak=0.999, replay_size=int(5e4),
                   decay_steps=int(2e5), epochs=50, steps_per_epoch=20000,
                   update_after=10000, anneal_lr=True)

EXP_PRESETS = {
    "exp2": dict(o="mlp", hidden_size=256, n_layers=2, msg_size=64,
                 lr=2.5e-4, polyak=0.999, decay_steps=int(5e4),
                 replay_size=int(5e3), max_seq_len=None,
                 epochs=100, steps_per_epoch=20000, update_after=10000,
                 norm_r=True, anneal_lr=True, double_q=True, dueling=False),
    "exp3": dict(o="gnn", hidden_size=256, n_layers=2, msg_size=64,
                 lr=2.5e-4, polyak=0.999, decay_steps=int(2e5),
                 replay_size=int(5e3), max_seq_len=None,
                 epochs=100, steps_per_epoch=30000, update_after=20000,
                 save_freq=10, norm_r=True, anneal_lr=True, double_q=True,
                 dueling=False),
}


def should_save(epoch, it, iters_per_epoch, n_iters, save_freq):
    """Checkpoint decision at an epoch boundary (``(it+1) % iters_per_epoch == 0``).

    The final save must key on the LAST EPOCH BOUNDARY, not the last
    iteration: when ``iters_per_epoch`` does not divide ``n_iters`` (exp2:
    2e6 steps at 1920 steps/iter = 1041 iters, 10 per epoch) the trailing
    iterations never reach an epoch boundary, so an ``it+1 == n_iters``
    condition would skip the final checkpoint entirely.
    """
    return (epoch % save_freq == 0) or (it + 1 + iters_per_epoch > n_iters)


def _maybe_inject_crash(it, fresh_start):
    """Test hook: raise once, mid-run, on a fresh (non-resumed) start.

    ``UAVBS_TEST_CRASH_AT_ITER=k`` simulates a tunnel/backend failure at
    iteration ``k`` so the retry path (``--retries``) can be regression-tested
    end-to-end: the relaunched process resumes from the newest checkpoint and
    must complete the full budget.
    """
    at = os.environ.get("UAVBS_TEST_CRASH_AT_ITER")
    if at is not None and fresh_start and it == int(at):
        raise RuntimeError(f"injected crash at iteration {it}")


def _supervise(retries):
    """Run this invocation as a supervised child; relaunch with ``--resume``.

    A dropped TPU tunnel wedges the in-process JAX backend (and can SIGKILL
    the client outright), so recovery needs a clean interpreter — the same
    role the reference's per-variant subprocess isolation plays
    (``utils/run_utils.py:170-184``).  The supervisor holds no backend; the
    child is marked via ``UAVBS_SUPERVISED`` so it doesn't recurse.  On
    SIGTERM/SIGINT (e.g. an outer ``timeout``), the child is terminated and
    no relaunch happens.  Returns only via ``sys.exit``.
    """
    import signal
    import subprocess

    env = dict(os.environ, UAVBS_SUPERVISED="1")
    child = None
    interrupted = []

    def _forward(signum, frame):
        interrupted.append(signum)
        if child is not None and child.poll() is None:
            child.terminate()

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    for attempt in range(retries + 1):
        argv = [sys.executable] + sys.argv
        if attempt and "--resume" not in argv:
            argv.append("--resume")
        child = subprocess.Popen(argv, env=env)
        rc = child.wait()
        if rc == 0:
            sys.exit(0)
        if interrupted:
            sys.exit(128 + interrupted[0])
        if attempt < retries:
            print(f"[run_fast] child exit={rc}; relaunching with --resume "
                  f"({retries - attempt - 1} retries left)", flush=True)
    sys.exit(rc)


def _maybe_resume(trainer, output_dir, eps_fn):
    """Load the newest checkpoint from ``output_dir`` and refill the replay.

    The device replay ring is not checkpointed (the reference doesn't persist
    its buffer either); after restoring params/optimizer/LR state, two warmup
    collections at the resumed epsilon re-seed it before updates continue.
    Returns the resumed (epoch, t_global), or (0, 0) when nothing to resume.
    """
    import glob
    import re
    ckpts = glob.glob(osp.join(output_dir or "", "checkpoint_epoch*.pt"))
    if not ckpts:
        # Visible in supervisor logs: a child that crashes before its first
        # checkpoint makes every --resume retry a fresh start — repeated
        # identical fresh runs would otherwise be indistinguishable from
        # progress.
        print(f"[run_fast] no checkpoint found in {output_dir!r}; "
              f"starting fresh", flush=True)
        return 0, 0
    latest = max(ckpts, key=lambda p: int(re.search(r"epoch(\d+)", p).group(1)))
    stamp = trainer.learner.load_checkpoint(latest)
    for _ in range(2):
        trainer.run_iteration(eps_fn(int(stamp["t"])), warmup=True)
    return int(stamp["epoch"]), int(stamp["t"])


def train_fast_exp1(env_kwargs, seed=0, train_overrides=None, logger_kwargs=None,
                    n_worlds=8, n_layouts=256, resume=False):
    """Full-budget exp1 (single-UBS DRQN) on the fused trainer."""
    kw = dict(EXP1_PRESET)
    kw.update(train_overrides or {})

    logger = EpochLogger(append=resume, **(logger_kwargs or {}))
    logger.save_config(dict(exp="exp1", env_kwargs=env_kwargs, seed=seed,
                            n_worlds=n_worlds, args=kw))

    trainer = FusedDrqnTrainer(env_kwargs, train_kwargs=kw, n_worlds=n_worlds,
                               n_layouts=n_layouts, seed=seed)
    args, T = trainer.args, trainer.T
    learner = trainer.learner

    total_steps = args.steps_per_epoch * args.epochs
    steps_per_iter = n_worlds * T
    n_iters = max(1, total_steps // steps_per_iter)
    iters_per_epoch = max(1, args.steps_per_epoch // steps_per_iter)
    update_after = max(args.update_after, args.batch_size * trainer.L)

    eps_start, eps_end = 1, 0.05
    eps = lambda t: max(eps_end, -(eps_start - eps_end) / args.decay_steps * t + eps_start)

    epoch0, t_global = (0, 0)
    if resume:
        epoch0, t_global = _maybe_resume(trainer, logger.output_dir, eps)
    t_resumed = t_global
    start_time = time.time()
    for it in range(epoch0 * iters_per_epoch, n_iters):
        _maybe_inject_crash(it, fresh_start=epoch0 == 0)
        warmup = t_global < update_after
        metrics = trainer.run_iteration(eps(t_global), warmup=warmup)
        t_global += steps_per_iter
        logger.store(**metrics)

        if (it + 1) % iters_per_epoch == 0:
            epoch = (it + 1) // iters_per_epoch
            logger.store(**trainer.evaluate(n_episodes=args.num_test_episodes))
            learner.step_lr_scheduler()

            if should_save(epoch, it, iters_per_epoch, n_iters, args.save_freq):
                save_path = osp.join(logger.output_dir or "/tmp",
                                     f"checkpoint_epoch{epoch}.pt")
                learner.save_checkpoint(save_path, stamp=dict(epoch=epoch, t=t_global))

            logger.log_tabular("Epoch", epoch)
            logger.log_tabular("EpRet", with_min_and_max=True)
            logger.log_tabular("AvgGlobalUtility", average_only=True)
            logger.log_tabular("FairIdx", average_only=True)
            logger.log_tabular("TestEpRet", with_min_and_max=True)
            logger.log_tabular("TestFairIdx", average_only=True)
            logger.log_tabular("TestAvgGlobalUtility", average_only=True)
            logger.log_tabular("TestTotalThroughput", average_only=True)
            logger.log_tabular("TotalEnvInteracts", t_global)
            if logger.epoch_dict.get("LossQ"):
                logger.log_tabular("LossQ", average_only=True)
            else:
                logger.log_tabular("LossQ", float("nan"))
            logger.log_tabular("StepsPerSec",
                               (t_global - t_resumed) / (time.time() - start_time))
            logger.log_tabular("Time", time.time() - start_time)
            logger.dump_tabular()

    print("Complete.")
    return trainer


def train_fast(exp, map_id, seed=0, train_overrides=None, logger_kwargs=None,
               n_worlds=40, n_layouts=256, resume=False, interleave=1):
    kw = dict(EXP_PRESETS[exp])
    kw.update(train_overrides or {})

    logger = EpochLogger(append=resume, **(logger_kwargs or {}))
    logger.save_config(dict(exp=exp, map_id=map_id, seed=seed,
                            n_worlds=n_worlds, interleave=interleave, args=kw))

    capacity = kw["replay_size"] - kw["replay_size"] % n_worlds
    trainer = FusedMadrqnTrainer(map_id, train_kwargs=kw, n_worlds=n_worlds,
                                 capacity_chunks=capacity, n_layouts=n_layouts,
                                 seed=seed, interleave=interleave)
    args, T = trainer.args, trainer.T
    learner = trainer.learner

    total_steps = args.steps_per_epoch * args.epochs
    steps_per_iter = n_worlds * T
    n_iters = max(1, total_steps // steps_per_iter)
    iters_per_epoch = max(1, args.steps_per_epoch // steps_per_iter)
    update_after = max(args.update_after, args.batch_size * T)

    eps_start, eps_end = 1, 0.05
    eps = lambda t: max(eps_end, -(eps_start - eps_end) / args.decay_steps * t + eps_start)

    epoch0, t_global = (0, 0)
    if resume:
        epoch0, t_global = _maybe_resume(trainer, logger.output_dir, eps)
    t_resumed = t_global
    start_time = time.time()
    for it in range(epoch0 * iters_per_epoch, n_iters):
        _maybe_inject_crash(it, fresh_start=epoch0 == 0)
        warmup = t_global < update_after
        metrics = trainer.run_iteration(eps(t_global), warmup=warmup)
        t_global += steps_per_iter
        logger.store(**metrics)

        if (it + 1) % iters_per_epoch == 0:
            epoch = (it + 1) // iters_per_epoch
            test_stats = trainer.evaluate(n_episodes=args.num_test_episodes)
            logger.store(**test_stats)
            learner.step_lr_scheduler()

            if should_save(epoch, it, iters_per_epoch, n_iters, args.save_freq):
                save_path = osp.join(logger.output_dir or "/tmp",
                                     f"checkpoint_epoch{epoch}.pt")
                learner.save_checkpoint(save_path, stamp=dict(epoch=epoch, t=t_global))

            logger.log_tabular("Epoch", epoch)
            logger.log_tabular("EpRet", with_min_and_max=True)
            logger.log_tabular("AvgGlobalUtility", average_only=True)
            logger.log_tabular("FairIdx", average_only=True)
            logger.log_tabular("TestEpRet", with_min_and_max=True)
            logger.log_tabular("TestFairIdx", average_only=True)
            logger.log_tabular("TestAvgGlobalUtility", average_only=True)
            logger.log_tabular("TestTotalThroughput", average_only=True)
            logger.log_tabular("TestProbCollision", average_only=True)
            logger.log_tabular("TotalEnvInteracts", t_global)
            if logger.epoch_dict.get("LossQ"):
                logger.log_tabular("LossQ", average_only=True)
            else:
                logger.log_tabular("LossQ", float("nan"))  # epoch was all warmup
            logger.log_tabular("StepsPerSec",
                               (t_global - t_resumed) / (time.time() - start_time))
            logger.log_tabular("Time", time.time() - start_time)
            logger.dump_tabular()

    print("Complete.")
    return trainer


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", choices=("exp1", "exp2", "exp3"), default="exp2")
    parser.add_argument("--map", dest="map_id", default=None)
    parser.add_argument("--c", default=None, help="comm protocol (none|base|disc|commnet|tarmac|econv)")
    parser.add_argument("--o", dest="obs_enc", default=None,
                        help="override observation encoder (mlp|gnn), e.g. the "
                             "exp3 MLP ablation variants (reference run_exp3 "
                             "figure legend *-MLP)")
    parser.add_argument("--mixer", action="store_true")
    parser.add_argument("--agent", default="rnn", help="exp1 agent type (rnn|gnn)")
    parser.add_argument("--n-grps", type=int, default=2, help="exp1 GT groups")
    parser.add_argument("--gts-per-grp", type=int, default=5, help="exp1 GTs per group")
    parser.add_argument("--seed", "-s", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--replay-size", type=int, default=None)
    parser.add_argument("--update-after", type=int, default=None)
    parser.add_argument("--device", default=None, help="'cpu' forces the host backend")
    parser.add_argument("--n-worlds", type=int, default=40)
    parser.add_argument("--interleave", type=int, default=1,
                        help="sub-iterations per fused iteration (collect "
                             "n_worlds/S episodes -> updates/S, x S)")
    parser.add_argument("--n-layouts", type=int, default=256)
    parser.add_argument("--compute-dtype", default="float32")
    parser.add_argument("--matmul-precision", default=None,
                        help="None|default|high|highest — f32 TPU matmul passes")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest checkpoint in the run dir")
    parser.add_argument("--name-suffix", default=None,
                        help="append '_<suffix>' to the auto run name (keeps "
                             "ablation runs out of committed run dirs)")
    parser.add_argument("--save-freq", type=int, default=None,
                        help="checkpoint cadence in epochs (default: preset)")
    parser.add_argument("--retries", type=int, default=0,
                        help="on crash, re-exec this process with --resume up "
                             "to N times (fresh backend; survives tunnel drops)")
    cli = parser.parse_args()

    if cli.retries > 0 and os.environ.get("UAVBS_SUPERVISED") != "1":
        _supervise(cli.retries)  # exits; training runs in supervised children

    from uav_bs_ctrl_tpu.algos.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    def _dispatch():
        if cli.exp == "exp1":
            overrides = dict(agent=cli.agent, compute_dtype=cli.compute_dtype,
                             matmul_precision=cli.matmul_precision)
            for k in ("epochs", "steps_per_epoch", "replay_size", "update_after",
                      "device", "save_freq"):
                v = getattr(cli, k)
                if v is not None:
                    overrides[k] = v
            env_kwargs = dict(n_grps=cli.n_grps, gts_per_grp=cli.gts_per_grp)
            name = f"exp1_fast_grp{cli.n_grps}_size{cli.gts_per_grp}_{cli.agent}"
            if cli.name_suffix:
                name += f"_{cli.name_suffix}"
            logger_kwargs = setup_logger_kwargs(name, cli.seed, data_dir=cli.data_dir)
            train_fast_exp1(env_kwargs, seed=cli.seed, train_overrides=overrides,
                            logger_kwargs=logger_kwargs, n_worlds=cli.n_worlds,
                            n_layouts=cli.n_layouts, resume=cli.resume)
            return

        map_id = cli.map_id or ("r400" if cli.exp == "exp2" else "4ubs")
        c = None if cli.c in (None, "none") else cli.c
        overrides = dict(c=c, mixer=cli.mixer, compute_dtype=cli.compute_dtype,
                         matmul_precision=cli.matmul_precision)
        if cli.obs_enc:
            overrides["o"] = cli.obs_enc
        for k in ("epochs", "steps_per_epoch", "replay_size", "update_after",
                  "device", "save_freq"):
            v = getattr(cli, k)
            if v is not None:
                overrides[k] = v

        name = f"{cli.exp}_fast_{map_id}_{c or 'iql'}" + ("_qmix" if cli.mixer else "")
        if cli.obs_enc:
            name += f"_{cli.obs_enc}"
        if cli.interleave > 1:
            name += f"_il{cli.interleave}"
        if cli.name_suffix:
            name += f"_{cli.name_suffix}"
        logger_kwargs = setup_logger_kwargs(name, cli.seed, data_dir=cli.data_dir)
        train_fast(cli.exp, map_id, seed=cli.seed, train_overrides=overrides,
                   logger_kwargs=logger_kwargs, n_worlds=cli.n_worlds,
                   n_layouts=cli.n_layouts, resume=cli.resume,
                   interleave=cli.interleave)

    _dispatch()
