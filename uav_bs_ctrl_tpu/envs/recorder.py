"""Episode recorders: capture per-step trajectories and render/export them.

Parity surface: reference ``envs/mubs_cov/recorder.py`` and
``envs/subs_cov/recorder.py`` — same artifacts per test episode:
``trajectories.png`` plus ``path_ubs.csv`` / ``pos_gts.csv`` / ``others.csv``
(CSV layouts match reference ``envs/common.py:80-100`` ``write_to_disk``).

Matplotlib is imported lazily with the Agg backend so headless training never
needs a display.
"""

import os
import os.path as osp
from itertools import product

import numpy as np
import pandas as pd


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def _circle(x0, y0, r, n=100):
    t = np.linspace(0, 2 * np.pi, n)
    return x0 + r * np.cos(t), y0 + r * np.sin(t)


def export_episode_csvs(save_dir, path_ubs, pos_gts, **series):
    """Write trajectory CSVs in the reference's layout."""
    ep_len = path_ubs.shape[0]
    n_ubs = path_ubs.shape[1] if path_ubs.ndim == 3 else 1
    n_gts = pos_gts.shape[0]

    cols = pd.MultiIndex.from_tuples(product([f"UBS-{i}" for i in range(n_ubs)],
                                             ["position"], ["x", "y"]))
    pd.DataFrame(path_ubs.reshape(ep_len, -1), columns=cols).to_csv(
        osp.join(save_dir, "path_ubs.csv"))

    pd.DataFrame(pos_gts, columns=["x", "y"],
                 index=[f"GT-{m}" for m in range(n_gts)]).to_csv(
        osp.join(save_dir, "pos_gts.csv"))

    pd.DataFrame(series).to_csv(osp.join(save_dir, "others.csv"))


def _draw_region(ax, range_pos):
    for a, b in [((0, 0), (range_pos, 0)), ((range_pos, 0), (range_pos, range_pos)),
                 ((range_pos, range_pos), (0, range_pos)), ((0, 0), (0, range_pos))]:
        ax.plot([a[0], b[0]], [a[1], b[1]], color="black")
    ax.axis([-0.1 * range_pos, 1.1 * range_pos, -0.1 * range_pos, 1.1 * range_pos])
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")


class MultiUbsRecorder:
    """Captures and renders multi-UBS episode trajectories."""

    def __init__(self, env):
        self.env = env
        self.film = dict(pos_ubs=None, reward=None, fair_idx=None)

    def __getattr__(self, item):
        return getattr(self.env, item)

    def reload(self):
        self.film = dict(pos_ubs=[self.pos_ubs.copy()], reward=[], fair_idx=[])

    def click(self, **kwargs):
        for k, v in kwargs.items():
            assert k in self.film and isinstance(self.film[k], list)
            self.film[k].append(v)

    def replay(self, annotate=True, show_img=False, save_dir=None):
        plt = _plt()
        fig, ax = plt.subplots()
        ax.set_aspect("equal")

        path_ubs = np.stack(self.film["pos_ubs"])
        final = path_ubs[-1]

        if self.t > 0:
            ax.scatter(path_ubs[0, :, 0], path_ubs[0, :, 1], marker="s", color="r")
            for i in range(self.n_ubs):
                ax.plot(path_ubs[:, i, 0], path_ubs[:, i, 1], linestyle="dashed",
                        color="r", linewidth=0.5)

        ax.scatter(final[:, 0], final[:, 1], marker="o", s=75, color="r", label="UBSs")
        ax.scatter(self.pos_gts[:, 0], self.pos_gts[:, 1], marker="o", color="b", label="GTs")

        for i in range(self.n_ubs):
            if self.r_cov < np.inf:
                ax.plot(*_circle(final[i, 0], final[i, 1], self.r_cov),
                        linestyle="dashed", color="black")
            if self.r_sns < np.inf:
                ax.plot(*_circle(final[i, 0], final[i, 1], self.r_sns),
                        linestyle="dashed", color="b", alpha=0.25, linewidth=0.5)
            if self.r_comm < np.inf:
                ax.plot(*_circle(final[i, 0], final[i, 1], self.r_comm),
                        linestyle="dashed", color="r", alpha=0.25, linewidth=0.5)

        _draw_region(ax, self.range_pos)

        if annotate:
            for i in range(self.n_ubs):
                ax.annotate(f"UBS-{i}", xy=final[i], xycoords="data",
                            xytext=(0, 5), textcoords="offset points", size="medium")

        ax.legend(loc="lower right")
        plt.title("Trajectories")

        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            export_episode_csvs(save_dir, path_ubs, pos_gts=self.pos_gts)
            plt.savefig(osp.join(save_dir, "trajectories.png"))
        plt.close(fig)


class SingleUbsRecorder:
    """Captures and renders single-UBS episodes (trajectory + fairness/reward panels)."""

    KEYS = ("pos_ubs", "global_utility", "reward", "total_throughput",
            "fair_idx", "velocity", "rate_per_gt")

    def __init__(self, env):
        self.env = env
        self.film = {k: [] for k in self.KEYS}

    def __getattr__(self, item):
        return getattr(self.env, item)

    def reload(self):
        self.film = {k: [] for k in self.KEYS}
        self.film["pos_ubs"] = [self.pos_ubs.copy()]

    def click(self, **kwargs):
        for k, v in kwargs.items():
            assert k in self.film and isinstance(self.film[k], list)
            self.film[k].append(v)

    def replay(self, annotate=True, show_img=False, save_dir=None):
        plt = _plt()
        import matplotlib.gridspec as gridspec

        fig = plt.figure(tight_layout=True)
        gs = gridspec.GridSpec(2, 4)

        ax = fig.add_subplot(gs[:, 0:2])
        ax.set_aspect("equal")

        path_ubs = np.stack(self.film["pos_ubs"])
        final = path_ubs[-1]

        ax.scatter(final[0], final[1], marker="o", s=75, color="r", label="UBS")
        ax.scatter(self.pos_gts[:, 0], self.pos_gts[:, 1], marker="o", color="b", label="GTs")

        if path_ubs.shape[0] > 1:
            ax.scatter(path_ubs[0, 0], path_ubs[0, 1], marker="s", color="r")
            ax.plot(path_ubs[:, 0], path_ubs[:, 1], linestyle="dashed", color="r", linewidth=0.5)

        if self.r_cov < np.inf:
            ax.plot(*_circle(final[0], final[1], self.r_cov), linestyle="dashed", color="black")

        _draw_region(ax, self.range_pos)

        if annotate:
            ax.annotate("UBS", xy=final, xycoords="data", xytext=(0, 5),
                        textcoords="offset points", size="medium")
            for m in range(self.n_gts):
                ax.annotate(f"GT-{m}", xy=self.pos_gts[m], xycoords="data",
                            xytext=(0, 5), textcoords="offset points", size="medium")
        ax.legend(loc="lower right")

        ax = fig.add_subplot(gs[:, 2:4])
        ax.set_xlabel("Timestep")
        ax.set_box_aspect(1)
        fair_idx = np.array(self.film["fair_idx"])
        ax.plot(fair_idx, color="tab:red")
        ax.set_ylabel("Jain's Fairness Index", color="tab:red")
        ax.tick_params(axis="y", labelcolor="tab:red")

        ax2 = ax.twinx()
        ax2.set_box_aspect(1)
        reward = np.array(self.film["reward"])
        ax2.plot(reward, color="tab:blue")
        ax2.set_ylabel("Reward", color="tab:blue")
        ax2.tick_params(axis="y", labelcolor="tab:blue")

        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            export_episode_csvs(save_dir, path_ubs, pos_gts=self.pos_gts,
                                fair_idx=fair_idx, reward=reward)
            plt.savefig(osp.join(save_dir, "trajectories.png"))
        plt.close(fig)
