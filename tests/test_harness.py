"""Experiment harness tests: grid semantics, logger formats, end-to-end
evaluation tooling (train tiny -> checkpoint -> test_series -> curves)."""

import json
import os
import os.path as osp

import numpy as np
import pandas as pd
import pytest

from uav_bs_ctrl_tpu.utils.logx import EpochLogger
from uav_bs_ctrl_tpu.utils.run_utils import ExperimentGrid, setup_logger_kwargs
from uav_bs_ctrl_tpu.utils.run_utils import test_eg as _example_grid


def test_grid_variants_cartesian_and_nesting():
    variants = _example_grid()
    # 3 * 3 * 2 * 2 * 1 * 1 = 36 variants
    assert len(variants) == 36
    v = variants[0]
    assert "test" in v and "a" in v["test"] and "b" in v["test"]
    assert set(v.keys()) == {"test", "some", "why", "huh", "no"}


def test_grid_variant_names():
    eg = ExperimentGrid(name="exp2")
    eg.add("seed", [0, 10])
    eg.add("env_kwargs:map_id", ["inf", "r400"], "", True)
    eg.add("train_kwargs:c", [None, "tarmac"], "", True)
    eg.add("train_kwargs:mixer", False, "qmix", True)
    names = {eg.variant_name(v) for v in eg.variants()}
    # Booleans appear as bare flags only when True; seed never appears.
    assert names == {"exp2_inf_none", "exp2_inf_tarmac",
                     "exp2_r400_none", "exp2_r400_tarmac"}

    eg2 = ExperimentGrid(name="exp2")
    eg2.add("env_kwargs:map_id", ["inf"], "", True)
    eg2.add("train_kwargs:mixer", True, "qmix", True)
    assert eg2.variant_name(eg2.variants()[0]) == "exp2_inf_qmix"


def test_setup_logger_kwargs_layout(tmp_path):
    kw = setup_logger_kwargs("exp1_grp2_rnn", seed=10, data_dir=str(tmp_path))
    assert kw["output_dir"] == osp.join(str(tmp_path), "exp1_grp2_rnn",
                                        "exp1_grp2_rnn_s10")
    assert kw["exp_name"] == "exp1_grp2_rnn"


def test_epoch_logger_progress_format(tmp_path):
    out = str(tmp_path / "run")
    logger = EpochLogger(output_dir=out, exp_name="fmt")
    logger.save_config(dict(exp_name="fmt", seed=3, lr=1e-3))
    for epoch in range(2):
        logger.store(EpRet=1.0 + epoch, EpRet2=2.0)
        logger.store(EpRet=3.0 + epoch)
        logger.log_tabular("Epoch", epoch)
        logger.log_tabular("EpRet", with_min_and_max=True)
        logger.log_tabular("EpRet2", average_only=True)
        logger.dump_tabular()

    df = pd.read_table(osp.join(out, "progress.txt"))
    assert list(df.columns) == ["Epoch", "AverageEpRet", "StdEpRet", "MaxEpRet",
                                "MinEpRet", "EpRet2"]
    assert df["AverageEpRet"].tolist() == [2.0, 3.0]
    assert df["MaxEpRet"].tolist() == [3.0, 4.0]

    cfg = json.load(open(osp.join(out, "config.json")))
    assert cfg["seed"] == 3 and cfg["exp_name"] == "fmt"


@pytest.mark.slow
def test_end_to_end_train_eval_curves(tmp_path):
    """Tiny madrqn train -> checkpoint -> test_series -> collect_curves."""
    from uav_bs_ctrl_tpu.algos.madrqn.run import train
    from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv
    import test_policies as tp
    import collect_curves as cc

    data_dir = str(tmp_path)
    exp_name = "mini_test"
    out = setup_logger_kwargs(exp_name, seed=0, data_dir=data_dir)

    np.random.seed(0)
    train(MultiUbsCoverageEnv, dict(map_id="test"), seed=0,
          train_kwargs=dict(device="cpu", o="mlp", c=None, hidden_size=16,
                            steps_per_epoch=120, epochs=1, update_after=60,
                            max_seq_len=5, num_test_episodes=1, save_freq=1,
                            batch_size=4),
          logger_kwargs=out)

    run_dir = out["output_dir"]
    assert osp.exists(osp.join(run_dir, "progress.txt"))
    assert osp.exists(osp.join(run_dir, "config.json"))
    assert osp.exists(osp.join(run_dir, "checkpoint_epoch1.pt"))
    # Recorder artifacts from the test episode.
    ep_dir = osp.join(run_dir, "epoch1_episode0")
    assert osp.exists(osp.join(ep_dir, "trajectories.png"))
    assert osp.exists(osp.join(ep_dir, "path_ubs.csv"))

    # Evaluation harness rebuilds the env from config.json.
    eval_out = osp.join(data_dir, "eval")
    summary = tp.test_series("madrqn", ["EpRet", "FairIdx"],
                             [osp.join(data_dir, exp_name)],
                             "checkpoint_epoch1.pt", 2, eval_out)
    assert osp.exists(osp.join(eval_out, "test_summary.csv"))
    assert ("EpRet", exp_name) in summary.columns

    # Curve collection.
    curves_out = osp.join(data_dir, "curves")
    df = cc.collect_curves([osp.join(data_dir, exp_name)], "TotalEnvInteracts",
                           "AverageEpRet", curves_out)
    assert osp.exists(osp.join(curves_out, "TotalEnvInteracts_vs_AverageEpRet.csv"))
    assert df.shape[0] == 1  # one epoch row


@pytest.mark.slow
def test_experiment_grid_subprocess_isolation(tmp_path):
    """A 1-variant grid must run through the pickled-thunk subprocess path."""
    from uav_bs_ctrl_tpu.utils.run_utils import ExperimentGrid
    from uav_bs_ctrl_tpu.algos.drqn.run import train as drqn_train
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv

    eg = ExperimentGrid(name="mini_grid")
    eg.add("seed", [0])
    eg.add("env_fn", SingleUbsCoverageEnv)
    eg.add("env_kwargs:n_grps", [2], "grp")
    eg.add("env_kwargs:gts_per_grp", 1, "size")
    eg.add("env_kwargs:episode_limit", 10)
    eg.add("train_kwargs:device", "cpu")
    eg.add("train_kwargs:agent", "rnn", "")
    eg.add("train_kwargs:hidden_size", 16)
    eg.add("train_kwargs:steps_per_epoch", 60)
    eg.add("train_kwargs:epochs", 1)
    eg.add("train_kwargs:update_after", 20)
    eg.add("train_kwargs:max_seq_len", 5)
    eg.add("train_kwargs:batch_size", 4)
    eg.add("train_kwargs:num_test_episodes", 1)
    eg.add("train_kwargs:save_freq", 5)
    eg.run(drqn_train, num_cpu=1, data_dir=str(tmp_path), datestamp=False)

    # n_grps has a single value and in_name=False, so it stays out of the name.
    run_dir = osp.join(str(tmp_path), "mini_grid", "mini_grid_s0")
    assert osp.exists(osp.join(run_dir, "progress.txt"))
    assert osp.exists(osp.join(run_dir, "config.json"))


def test_grid_fail_fast_false_continues(tmp_path):
    """With fail_fast=False a crashing variant doesn't abort the grid."""
    from uav_bs_ctrl_tpu.utils.run_utils import ExperimentGrid

    def boom(**kwargs):
        raise RuntimeError("variant failed")

    eg = ExperimentGrid(name="boom_grid")
    eg.add("seed", [0, 1])
    failures = eg.run(boom, data_dir=str(tmp_path), fail_fast=False)
    assert failures == ["boom_grid", "boom_grid"]


def test_profiler_trace_and_timer(tmp_path):
    """jax.profiler trace context writes a trace; StepTimer reports phases."""
    import jax.numpy as jnp
    from uav_bs_ctrl_tpu.utils.profiling import StepTimer, trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert os.path.isdir(logdir) and len(os.listdir(logdir)) > 0

    timer = StepTimer()
    with timer.phase("Act"):
        pass
    with timer.phase("Act"):
        pass
    out = timer.flush()
    assert "TimeActMs" in out and out["TimeActMs"] >= 0
    assert timer.flush() == {}


@pytest.mark.slow
def test_drqn_train_eval_end_to_end(tmp_path):
    """Tiny drqn train -> checkpoint -> test_series via the drqn eval path."""
    from uav_bs_ctrl_tpu.algos.drqn.run import train
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv
    import test_policies as tp

    data_dir = str(tmp_path)
    exp_name = "mini_drqn"
    out = setup_logger_kwargs(exp_name, seed=0, data_dir=data_dir)

    np.random.seed(0)
    train(SingleUbsCoverageEnv, dict(n_grps=2, gts_per_grp=1, episode_limit=10),
          seed=0,
          train_kwargs=dict(device="cpu", agent="rnn", hidden_size=16,
                            steps_per_epoch=60, epochs=1, update_after=20,
                            max_seq_len=5, num_test_episodes=1, save_freq=1,
                            batch_size=4),
          logger_kwargs=out)

    eval_out = osp.join(data_dir, "eval_drqn")
    summary = tp.test_series("drqn", ["EpRet", "FairIdx"],
                             [osp.join(data_dir, exp_name)],
                             "checkpoint_epoch1.pt", 2, eval_out)
    assert osp.exists(osp.join(eval_out, "test_summary.csv"))
    assert ("EpRet", exp_name) in summary.columns


def test_plot_utils_render_curves(tmp_path):
    """utils.plot renders mean±sd curves from progress.txt runs to a file."""
    import matplotlib
    matplotlib.use("Agg")
    from uav_bs_ctrl_tpu.utils import plot as plot_mod

    # Two seeds of the same experiment.
    for seed in (0, 1):
        d = tmp_path / "expX" / f"expX_s{seed}"
        d.mkdir(parents=True)
        (d / "config.json").write_text(json.dumps({"exp_name": "expX", "seed": seed}))
        rows = ["Epoch\tAverageEpRet\tTotalEnvInteracts"]
        for ep in range(4):
            rows.append(f"{ep}\t{float(ep + seed)}\t{(ep + 1) * 100}")
        (d / "progress.txt").write_text("\n".join(rows) + "\n")

    out_png = str(tmp_path / "curves.png")
    plot_mod.make_plots([str(tmp_path / "expX")], xaxis="Epoch",
                        values="AverageEpRet", out_path=out_png)
    assert osp.exists(out_png)
