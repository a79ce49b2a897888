"""Aggregate training curves across seeds into CSVs.

Parity surface: reference ``collect_curves.py`` — walks experiment dirs,
extracts an x-vs-metric column pair from each ``progress.txt``, concatenates
across seeds keyed by (exp_name, seed), writes ``<xaxis>_vs_<metric>.csv``.
"""

import json
import os
import os.path as osp

import pandas as pd


def collect_curves(all_logdirs, xaxis, metric, output_dir):
    dataset = []
    for logdir in all_logdirs:
        for root, dirs, files in os.walk(logdir):
            if 'progress.txt' in files:
                try:
                    with open(os.path.join(root, 'config.json')) as f:
                        config = json.load(f)

                    exp_name = config['exp_name']
                    seed = config['seed']
                    exp_data = pd.read_table(os.path.join(root, 'progress.txt'))

                    identifier = pd.MultiIndex.from_tuples([(exp_name, f'seed{seed}')])
                    index = exp_data[xaxis]
                    if xaxis == 'TotalEnvInteracts':
                        index /= 1e6
                    exp_data = pd.DataFrame(exp_data[metric].to_numpy(), index=index,
                                            columns=identifier)
                    # Resumed runs append to progress.txt; keep the last row
                    # per x value so re-logged epochs don't break the concat.
                    # Assumes re-logged epochs appear after the originals and
                    # hit the same x values exactly — true for epoch-boundary
                    # resumes (run_fast restores t from the checkpoint stamp);
                    # sort by index afterwards in case a resume interleaves.
                    exp_data = exp_data[~exp_data.index.duplicated(keep='last')]
                    exp_data = exp_data.sort_index()
                    dataset.append(exp_data)
                except Exception:
                    print('Could not read from %s' % root)
                    continue

    dataset = pd.concat(dataset, axis=1)
    os.makedirs(output_dir, exist_ok=True)
    dataset.to_csv(osp.join(output_dir, f'{xaxis}_vs_{metric}.csv'))
    return dataset


if __name__ == '__main__':
    base_dir = './data'

    grps = [2, 3, 4]
    agents = ['rnn', 'gnn']
    all_logdirs = [osp.join(base_dir, f"exp1_grp{g}_{a}") for g in grps for a in agents]
    collect_curves(all_logdirs, 'TotalEnvInteracts', 'AverageEpRet', './data/exp1_curves')

    maps = ['r400', 'r800', 'inf']
    agents = ['none', 'none_qmix', 'tarmac', 'disc']
    all_logdirs = [osp.join(base_dir, f"exp2_{m}_{a}") for m in maps for a in agents]
    collect_curves(all_logdirs, 'TotalEnvInteracts', 'AverageEpRet', './data/exp2_curves')

    maps = ['4ubs', '6ubs', '8ubs']
    all_logdirs = [osp.join(base_dir, f"exp3_{m}_gnn_{a}") for m in maps for a in agents]
    collect_curves(all_logdirs, 'TotalEnvInteracts', 'AverageEpRet', './data/exp3_curves')
