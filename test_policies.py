"""Trained-policy evaluation harness.

Parity surface: reference ``test_policies.py`` — walks log dirs, rebuilds each
env from its saved ``config.json`` (env class name -> ``envs.REGISTRY``),
loads the checkpoint, rolls N greedy episodes, merges per-seed results, and
writes ``test_summary.csv`` (+ transposed variant) and box plots.
"""

import json
import os
import os.path as osp

import numpy as np
import pandas as pd

from uav_bs_ctrl_tpu.algos.drqn.run import load_and_run_policy as test_drqn
from uav_bs_ctrl_tpu.algos.madrqn.run import load_and_run_policy as test_madrqn
from uav_bs_ctrl_tpu.envs import REGISTRY as env_REGISTRY

TEST_FUNCTIONS = {
    'drqn': test_drqn,
    'madrqn': test_madrqn,
}


def parse_run_config(config, device=None):
    """Normalize a saved ``config.json`` into (algo, env_fn, env_kwargs, args).

    Two on-disk formats exist:
    - classic ``train()`` runs (reference layout, ``test_policies.py:47-60``):
      ``env_fn`` holds the env class name and ``args`` is a single-entry dict.
    - ``run_fast.py`` fused-trainer runs: ``exp`` ∈ {exp1, exp2, exp3} with
      ``env_kwargs`` (exp1) or ``map_id`` (exp2/3) and a flat ``args`` dict.
    Checkpoints are interchangeable (same param pytrees; see
    ``tests/test_vec_train.py::test_vec_checkpoint_loads_in_classic_learner``).
    """
    args = config['args']
    if isinstance(args, dict) and args and isinstance(list(args.values())[0], dict):
        args = list(args.values())[0]
    args = dict(args)
    if device is not None:
        args['device'] = device

    if 'env_fn' in config:
        algo = config.get('algo', 'madrqn')
        env_fn = env_REGISTRY[config['env_fn']]
        env_kwargs = config['env_kwargs']
    elif config.get('exp') == 'exp1':
        algo = 'drqn'
        env_fn = env_REGISTRY['SingleUbsCoverageEnv']
        env_kwargs = dict(config['env_kwargs'])
    else:
        algo = 'madrqn'
        env_fn = env_REGISTRY['MultiUbsCoverageEnv']
        env_kwargs = dict(map_id=config['map_id'])
    return algo, env_fn, env_kwargs, args


def insert_data(dataset, exp_name, new_data):
    """Merge results of one run into the per-experiment dataset."""
    if exp_name not in dataset:
        dataset[exp_name] = dict()
    for k in new_data.keys():
        if k in dataset[exp_name]:
            dataset[exp_name][k] = pd.concat([dataset[exp_name][k], new_data[k]],
                                             ignore_index=True)
        else:
            dataset[exp_name][k] = new_data[k]
    return dataset


def test_series(algo_name, metrics, all_logdirs, checkpoint, n_episodes, output_dir,
                device=None):
    """Evaluate every run directory containing the requested checkpoint."""
    dataset = {}

    for logdir in all_logdirs:
        for root, dirs, files in os.walk(logdir):
            if checkpoint in files:
                with open(os.path.join(root, 'config.json')) as f:
                    config = json.load(f)

                exp_name = config['exp_name']
                seed = config['seed']
                algo, env_fn, env_kwargs, args = parse_run_config(config, device)
                model_path = osp.join(root, checkpoint)

                subdir = osp.join(output_dir, exp_name + f'_seed{seed}')
                os.makedirs(subdir, exist_ok=True)

                test_fn = TEST_FUNCTIONS[algo_name or algo]
                test_rsts = test_fn(model_path, env_fn, env_kwargs, seed, args,
                                    n_episodes, subdir)
                dataset = insert_data(dataset, exp_name, test_rsts)

    summary = []
    for exp_name in dataset.keys():
        for metric in metrics:
            summary.append(pd.DataFrame(dataset[exp_name][metric].to_numpy(),
                                        columns=[np.array([metric]), np.array([exp_name])]))
    summary = pd.concat(summary, axis=1)
    summary.columns.set_names(['metric', 'exp_name'], inplace=True)
    summary = summary.sort_index(axis=1)
    os.makedirs(output_dir, exist_ok=True)
    summary.to_csv(osp.join(output_dir, 'test_summary.csv'))

    cols = pd.MultiIndex.from_product([dataset.keys(), summary.index],
                                      names=('exp_name', 'episode'))
    summary_t = pd.DataFrame(columns=cols, index=metrics)
    for metric in metrics:
        for exp_name in dataset.keys():
            summary_t.loc[metric, exp_name] = summary[metric][exp_name].to_numpy().T
    summary_t.to_csv(osp.join(output_dir, 'test_summary_t.csv'))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    n_rows = 2
    while 2 * n_rows < len(metrics):
        n_rows += 1
    fig, axes = plt.subplots(nrows=n_rows, ncols=2)
    plt.subplots_adjust(wspace=0.35, hspace=0.5)
    for i, m in enumerate(metrics):
        if m in summary.columns:
            summary[m].plot.box(ax=axes[i // 2, i % 2], figsize=(6, 4))
            axes[i // 2, i % 2].set_title(m)
    plt.savefig(osp.join(output_dir, 'test_summary.png'))
    plt.close(fig)
    return summary


if __name__ == '__main__':
    import argparse

    parser = argparse.ArgumentParser(
        description="Evaluate trained checkpoints (classic or run_fast outputs).")
    parser.add_argument('--logdirs', nargs='+', default=None,
                        help="run directories to walk (default: exp1 grid)")
    parser.add_argument('--ckpt', default='checkpoint_epoch50.pt')
    parser.add_argument('--algo', default=None, choices=(None, 'drqn', 'madrqn'),
                        help="override; inferred from each config.json if omitted")
    parser.add_argument('--episodes', '-n', type=int, default=10)
    parser.add_argument('--out', default=None)
    parser.add_argument('--device', default='cpu',
                        help="evaluation device (greedy rollouts are host-cheap)")
    parser.add_argument('--metrics', nargs='+',
                        default=['EpRet', 'AvgGlobalUtility', 'TotalThroughput',
                                 'FairIdx'])
    cli = parser.parse_args()

    base_dir = './data'
    if cli.logdirs:
        out = cli.out or osp.join(base_dir, 'test_series')
        test_series(cli.algo, cli.metrics, cli.logdirs, cli.ckpt, cli.episodes,
                    out, device=cli.device)
    else:
        # Reference default: all candidates in experiment 1.
        for n_grps in [2, 3, 4]:
            all_logdirs = [osp.join(base_dir, f"exp1_grp{n_grps}_{agent}")
                           for agent in ['rnn', 'gnn']]
            output_dir = osp.join(base_dir, 'test_exp1', f'{n_grps}grps')
            test_series('drqn', cli.metrics, all_logdirs, cli.ckpt, cli.episodes,
                        output_dir, device=cli.device)
