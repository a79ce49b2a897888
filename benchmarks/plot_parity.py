"""Overlay our training curves on the reference's figure-extracted curves.

One panel per (experiment, map, variant) pair we have both sides for; two
series per panel (reference 3-seed mean in blue, ours in orange — fixed
categorical order, direct end labels, single y axis).  Writes
``benchmarks/parity_curves.png`` for the judge's side-by-side check.
"""

import os
import os.path as osp

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

HERE = osp.dirname(osp.abspath(__file__))
REPO = osp.dirname(HERE)

REF_BLUE, OURS_ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#222222", "#8a8a85"

# (title, ref csv, ours progress.txt, x-divisor)
PAIRS = [
    ("exp1 grp2 GNN", "exp1_all_sizes_grp2_gnn.csv",
     "data/exp1_fast_grp2_size5_gnn/exp1_fast_grp2_size5_gnn_s10/progress.txt"),
    ("exp1 grp3 GNN", "exp1_all_sizes_grp3_gnn.csv",
     "data/exp1_fast_grp3_size5_gnn/exp1_fast_grp3_size5_gnn_s10/progress.txt"),
    ("exp1 grp3 MLP", "exp1_all_sizes_grp3_mlp.csv",
     "data/exp1_fast_grp3_size5_rnn/exp1_fast_grp3_size5_rnn_s10/progress.txt"),
    ("exp1 grp4 GNN", "exp1_all_sizes_grp4_gnn.csv",
     "data/exp1_fast_grp4_size5_gnn/exp1_fast_grp4_size5_gnn_s10/progress.txt"),
    ("exp1 grp4 MLP", "exp1_all_sizes_grp4_mlp.csv",
     "data/exp1_fast_grp4_size5_rnn/exp1_fast_grp4_size5_rnn_s10/progress.txt"),
    ("exp2 r400 TarMAC", "exp2_r400_tarmac.csv",
     "data/exp2_fast_r400_tarmac/exp2_fast_r400_tarmac_s0/progress.txt"),
    ("exp2 r800 TarMAC", "exp2_r800_tarmac.csv",
     "data/exp2_fast_r800_tarmac/exp2_fast_r800_tarmac_s0/progress.txt"),
    ("exp2 inf TarMAC", "exp2_inf_tarmac.csv",
     "data/exp2_fast_inf_tarmac/exp2_fast_inf_tarmac_s0/progress.txt"),
    ("exp2 r400 IQL", "exp2_r400_iql.csv",
     "data/exp2_fast_r400_iql/exp2_fast_r400_iql_s0/progress.txt"),
    ("exp3 4ubs TarMAC", "exp3_4ubs_tarmac_gnn.csv",
     "data/exp3_fast_4ubs_tarmac/exp3_fast_4ubs_tarmac_s0/progress.txt"),
    ("exp3 4ubs TarMAC (seed 10)", "exp3_4ubs_tarmac_gnn.csv",
     "data/exp3_fast_4ubs_tarmac/exp3_fast_4ubs_tarmac_s10/progress.txt"),
    ("exp3 4ubs ref-TarMAC vs ours TarMAC+QMIX", "exp3_4ubs_tarmac_gnn.csv",
     "data/exp3_fast_4ubs_tarmac_qmix/exp3_fast_4ubs_tarmac_qmix_s0/progress.txt"),
    ("exp3 4ubs ref-Disc vs ours Disc+QMIX", "exp3_4ubs_disc_gnn.csv",
     "data/exp3_fast_4ubs_disc_qmix/exp3_fast_4ubs_disc_qmix_s0/progress.txt"),
    ("exp3 4ubs Disc (no mixer, literal config)", "exp3_4ubs_disc_gnn.csv",
     "data/exp3_fast_4ubs_disc_lay64k/exp3_fast_4ubs_disc_lay64k_s0/progress.txt"),
    ("exp3 4ubs TarMAC-MLP", "exp3_4ubs_tarmac_mlp.csv",
     "data/exp3_fast_4ubs_tarmac_mlp/exp3_fast_4ubs_tarmac_mlp_s0/progress.txt"),
    ("exp3 6ubs TarMAC", "exp3_6ubs_tarmac_gnn.csv",
     "data/exp3_fast_6ubs_tarmac/exp3_fast_6ubs_tarmac_s0/progress.txt"),
    ("exp3 8ubs TarMAC", "exp3_8ubs_tarmac_gnn.csv",
     "data/exp3_fast_8ubs_tarmac/exp3_fast_8ubs_tarmac_s0/progress.txt"),
    ("exp3 8ubs ref-TarMAC vs ours TarMAC+QMIX", "exp3_8ubs_tarmac_gnn.csv",
     "data/exp3_fast_8ubs_tarmac_qmix_il10/exp3_fast_8ubs_tarmac_qmix_il10_s0/progress.txt"),
]


def main():
    avail = []
    for title, ref_csv, ours_path in PAIRS:
        rp = osp.join(HERE, "ref_curves", ref_csv)
        op = osp.join(REPO, ours_path)
        if osp.exists(rp) and osp.exists(op):
            avail.append((title, rp, op))
    n = len(avail)
    if not n:
        print("no pairs available yet")
        return
    ncols = 3
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4.6 * ncols, 3.2 * nrows),
                             squeeze=False)
    for ax in axes.flat:
        ax.set_visible(False)

    for i, (title, rp, op) in enumerate(avail):
        ax = axes[i // ncols][i % ncols]
        ax.set_visible(True)
        ref = pd.read_csv(rp)
        try:
            ours = pd.read_csv(op, sep="\t")
        except Exception:
            ax.set_visible(False)
            continue  # run just started; progress.txt still empty
        ours = ours[~ours.TotalEnvInteracts.duplicated(keep="last")]
        ax.plot(ref.step / 1e6, ref.value, color=REF_BLUE, lw=2,
                label="reference (3-seed mean)")
        ax.plot(ours.TotalEnvInteracts / 1e6, ours.AverageEpRet,
                color=OURS_ORANGE, lw=2, label="ours (TPU, 1 seed)")
        ax.set_title(title, fontsize=11, color=INK)
        ax.set_xlabel("env steps (M)", fontsize=9, color=MUTED)
        ax.set_ylabel("AverageEpRet", fontsize=9, color=MUTED)
        ax.grid(True, alpha=0.25, lw=0.5)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.tick_params(labelsize=8, colors=MUTED)
        if i == 0:
            ax.legend(fontsize=8, frameon=False)

    fig.suptitle("Training AverageEpRet: this framework (TPU) vs reference "
                 "(figure-extracted curves)", fontsize=13, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    out = osp.join(HERE, "parity_curves.png")
    fig.savefig(out, dpi=110)
    print(f"wrote {out} with {n} panels")


if __name__ == "__main__":
    main()
