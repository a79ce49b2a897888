"""Training-curve plotting (seaborn mean±sd across seeds).

Parity surface: reference ``utils/plot.py`` — walks logdirs for
``progress.txt`` files, groups runs by ``exp_name`` (from ``config.json``),
and renders mean±sd curves; same CLI flags (logdir prefixes, --xaxis,
--value, --count, --smooth, --select, --exclude, --est).
"""

import json
import os
import os.path as osp

import numpy as np
import pandas as pd

DIV_LINE_WIDTH = 50

exp_idx = 0
units = dict()


def plot_data(data, xaxis='Epoch', value="AverageEpRet", condition="Condition1",
              smooth=1, **kwargs):
    import matplotlib.pyplot as plt
    import seaborn as sns

    if smooth > 1:
        # Moving-window average of width `smooth`.
        y = np.ones(smooth)
        for datum in data:
            x = np.asarray(datum[value])
            z = np.ones(len(x))
            datum[value] = np.convolve(x, y, 'same') / np.convolve(z, y, 'same')

    if isinstance(data, list):
        data = pd.concat(data, ignore_index=True)
    sns.set(style="darkgrid", font_scale=1.5)
    sns.lineplot(data=data, x=xaxis, y=value, hue=condition, errorbar='sd', **kwargs)
    plt.legend(loc='best')

    if np.max(np.asarray(data[xaxis])) > 5e3:
        plt.ticklabel_format(style='sci', axis='x', scilimits=(0, 0))
    plt.tight_layout(pad=0.5)


def get_datasets(logdir, condition=None):
    """Collect every ``progress.txt`` under ``logdir`` as a labeled DataFrame."""
    global exp_idx, units
    datasets = []
    for root, _, files in os.walk(logdir):
        if 'progress.txt' in files:
            exp_name = None
            try:
                with open(os.path.join(root, 'config.json')) as f:
                    config = json.load(f)
                exp_name = config.get('exp_name')
            except Exception:
                print('No file named config.json')
            condition1 = condition or exp_name or 'exp'
            condition2 = condition1 + '-' + str(exp_idx)
            exp_idx += 1
            units.setdefault(condition1, 0)
            unit = units[condition1]
            units[condition1] += 1

            try:
                exp_data = pd.read_table(os.path.join(root, 'progress.txt'))
            except Exception:
                print('Could not read from %s' % os.path.join(root, 'progress.txt'))
                continue
            performance = ('AverageTestEpRet' if 'AverageTestEpRet' in exp_data
                           else 'AverageEpRet')
            exp_data.insert(len(exp_data.columns), 'Unit', unit)
            exp_data.insert(len(exp_data.columns), 'Condition1', condition1)
            exp_data.insert(len(exp_data.columns), 'Condition2', condition2)
            exp_data.insert(len(exp_data.columns), 'Performance', exp_data[performance])
            datasets.append(exp_data)
    return datasets


def get_all_datasets(all_logdirs, legend=None, select=None, exclude=None):
    """Resolve logdir prefixes, apply select/exclude rules, load all runs."""
    logdirs = []
    for logdir in all_logdirs:
        if osp.isdir(logdir) and logdir[-1] == os.sep:
            logdirs += [logdir]
        else:
            basedir = osp.dirname(logdir)
            prefix = logdir.split(os.sep)[-1]
            listdir = os.listdir(basedir)
            logdirs += sorted(osp.join(basedir, x) for x in listdir if prefix in x)

    if select is not None:
        logdirs = [log for log in logdirs if all(x in log for x in select)]
    if exclude is not None:
        logdirs = [log for log in logdirs if all(x not in log for x in exclude)]

    print('Plotting from...\n' + '=' * DIV_LINE_WIDTH + '\n')
    for logdir in logdirs:
        print(logdir)
    print('\n' + '=' * DIV_LINE_WIDTH)

    assert not legend or (len(legend) == len(logdirs)), \
        "Must give a legend title for each set of experiments."

    data = []
    if legend:
        for log, leg in zip(logdirs, legend):
            data += get_datasets(log, leg)
    else:
        for log in logdirs:
            data += get_datasets(log)
    return data


def make_plots(all_logdirs, legend=None, xaxis=None, values=None, count=False,
               font_scale=1.5, smooth=1, select=None, exclude=None, estimator='mean',
               out_path=None):
    import matplotlib
    if out_path is not None:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    data = get_all_datasets(all_logdirs, legend, select, exclude)
    values = values if isinstance(values, list) else [values]
    condition = 'Condition2' if count else 'Condition1'
    estimator = getattr(np, estimator)
    for value in values:
        plt.figure()
        plot_data(data, xaxis=xaxis, value=value, condition=condition, smooth=smooth,
                  estimator=estimator)
        if out_path is not None:
            plt.savefig(out_path if len(values) == 1
                        else out_path.replace('.png', f'_{value}.png'))
    if out_path is None:
        plt.show()


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('logdir', nargs='*')
    parser.add_argument('--legend', '-l', nargs='*')
    parser.add_argument('--xaxis', '-x', default='TotalEnvInteracts')
    parser.add_argument('--value', '-y', default='Performance', nargs='*')
    parser.add_argument('--count', action='store_true')
    parser.add_argument('--smooth', '-s', type=int, default=1)
    parser.add_argument('--select', nargs='*')
    parser.add_argument('--exclude', nargs='*')
    parser.add_argument('--est', default='mean')
    parser.add_argument('--out', default=None, help='Save to file instead of showing.')
    args = parser.parse_args()

    make_plots(args.logdir, args.legend, args.xaxis, args.value, args.count,
               smooth=args.smooth, select=args.select, exclude=args.exclude,
               estimator=args.est, out_path=args.out)


if __name__ == "__main__":
    main()
