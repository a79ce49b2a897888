"""Shift-fit: is the exp3 reference curve our curve translated in steps?

Round-4 root-cause analysis for the uniform exp3 takeoff lag.  For each exp3
cell, finds the time translation d minimizing RMSE between the reference's
figure-extracted 3-seed-mean curve (benchmarks/ref_curves/*.csv) and our
single-seed training curve shifted by d, and compares against a 3-component
staggered-seed mixture fit (mean of three shifted copies of our curve).

Round-4 findings (re-derivable by running this):

- 4ubs disc:  shift -0.75M, RMSE 6.7 (ref std 30)  [disc+qmix lay64k s0]
- 4ubs tarmac: shift -0.70M, RMSE 6.5 (ref std 26)
- 6ubs tarmac: shift -0.95M, RMSE 27 (ref std 45)
- 8ubs tarmac: shift -1.75M, RMSE 68 (ref std 64) — our 3M curve is still
  mid-climb; the 6M resume tightens this fit.
- The 3-shift mixture fit collapses to equal shifts (RMSE 6.60 vs 6.67
  single-shift on 4ubs disc): NO evidence that the reference mean is a
  mixture of staggered per-seed takeoffs distinguishable from a pure
  translation at this extraction resolution.

Interpretation: the reference curves are OUR curves translated ~0.7-1.0M
steps earlier — identical shape and asymptote, constant takeoff offset.
Combined with the eliminated hypotheses (mixer, layout distribution,
interleave granularity il1/il10/il20, and round-4's il40 = exact
1-episode/1-update reference cadence, which tracks il1 within noise), the
surviving explanation is takeoff-TIME variance: when coverage behavior is
discovered under joint eps-greedy exploration, not how fast it is refined
afterward.  The s10/s20 4ubs disc+qmix seeds measure our own takeoff spread.

Usage: python benchmarks/shift_fit.py
"""

import glob
import os.path as osp

import numpy as np
import pandas as pd

HERE = osp.dirname(osp.abspath(__file__))
REPO = osp.dirname(HERE)

CELLS = [
    ("exp3_4ubs_disc_gnn", "exp3_fast_4ubs_disc_qmix_lay64k"),
    ("exp3_4ubs_disc_gnn", "exp3_fast_4ubs_disc_lay64k"),
    ("exp3_4ubs_tarmac_gnn", "exp3_fast_4ubs_tarmac_qmix"),
    ("exp3_6ubs_tarmac_gnn", "exp3_fast_6ubs_tarmac_qmix_il10_lay64k"),
    ("exp3_8ubs_tarmac_gnn", "exp3_fast_8ubs_tarmac_qmix_il10_lay64k"),
]


def load_ours(run_dir):
    f = sorted(glob.glob(osp.join(REPO, "data", run_dir, "*", "progress.txt")))[0]
    t = pd.read_table(f)
    return t["TotalEnvInteracts"].values, t["AverageEpRet"].values, f


def shift_fit(ref_name, run_dir, n_components=1):
    ref = pd.read_csv(osp.join(HERE, "ref_curves", ref_name + ".csv"))
    x_r, y_r = ref["step"].values, ref["value"].values
    x_o, y_o, f = load_ours(run_dir)

    def ours_at(t, d):
        return np.interp(t - d, x_o, y_o, left=y_o[0], right=y_o[-1])

    ts = np.linspace(1e5, min(x_r.max(), x_o.max() + 1.5e6), 60)
    ref_t = np.interp(ts, x_r, y_r)
    shifts = np.arange(-2.5e6, 1.01e6, 5e4)
    if n_components == 1:
        rmse, d = min((np.sqrt(np.mean((ours_at(ts, d) - ref_t) ** 2)), d)
                      for d in shifts)
        return rmse, (d,), np.std(ref_t)
    from itertools import combinations_with_replacement
    coarse = np.arange(-1.5e6, 1.01e6, 1e5)
    best = min(
        ((np.sqrt(np.mean((sum(ours_at(ts, d) for d in ds) / n_components
                           - ref_t) ** 2)), ds)
         for ds in combinations_with_replacement(coarse, n_components)))
    return best[0], best[1], np.std(ref_t)


def takeoff_step(x, y, frac=0.25):
    """First step where the curve sustainedly crosses ``frac`` of its final
    level (mean of the last 8%) — a translation-invariant takeoff marker."""
    final = np.mean(y[int(len(y) * 0.92):])
    thresh = frac * final
    above = y >= thresh
    for i in range(len(above)):
        if above[i:].all() or (above[i] and above[i:i + 3].all()):
            return x[i]
    return float("nan")


def takeoff_table():
    """Takeoff steps for the reference curves and every local seed of each
    cell — the spread across our seeds is the measurement that closes the
    takeoff-variance question."""
    print("\ntakeoff (first sustained crossing of 25% of final level):")
    for ref_name, run_dir in CELLS:
        ref = pd.read_csv(osp.join(HERE, "ref_curves", ref_name + ".csv"))
        t_ref = takeoff_step(ref["step"].values, ref["value"].values)
        rows = [f"ref(3-seed mean) {t_ref / 1e6:.2f}M"]
        for f in sorted(glob.glob(osp.join(REPO, "data", run_dir, "*",
                                           "progress.txt"))):
            t = pd.read_table(f)
            seed = f.split("_s")[-1].split("/")[0]
            tk = takeoff_step(t["TotalEnvInteracts"].values,
                              t["AverageEpRet"].values)
            rows.append(f"s{seed} {tk / 1e6:.2f}M")
        print(f"  {ref_name:24s} {'  '.join(rows)}")


def main():
    for ref_name, run_dir in CELLS:
        rmse, ds, std = shift_fit(ref_name, run_dir)
        print(f"{ref_name:24s} vs {run_dir:42s} "
              f"shift {ds[0] / 1e6:+.2f}M  RMSE {rmse:5.2f}  ref-std {std:.1f}")
    rmse3, ds3, _ = shift_fit(*CELLS[0], n_components=3)
    print(f"{CELLS[0][0]:24s} 3-seed-stagger mixture: RMSE {rmse3:5.2f} "
          f"shifts {tuple(round(d / 1e6, 1) for d in ds3)}M "
          f"(vs single-shift above — no stagger evidence if ~equal)")
    takeoff_table()


if __name__ == "__main__":
    main()
