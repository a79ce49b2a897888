"""Takeoff milestones: steps at which a training curve first crosses
thresholds, for our run dirs (progress.txt) and the reference's
figure-extracted curves (benchmarks/ref_curves/*.csv).

Used by the round-5 matmul-precision takeoff study (RESULTS.md): the
committed exp3 runs train f32 on TPU where DEFAULT precision lowers every
matmul to bf16 MXU passes (~1e-2 rel error); the reference's CUDA math is
true f32.  Compare a JAX_DEFAULT_MATMUL_PRECISION=highest run against its
default-precision twin and the reference curve.

Usage:
  python benchmarks/takeoff_milestones.py <run_dir_or_ref_csv> [...]
Each arg is a run dir containing progress.txt (uses AverageEpRet vs
TotalEnvInteracts) or a ref_curves CSV (step,value).
"""

import csv
import os.path as osp
import sys

THRESHOLDS = (10, 20, 40, 60)


def curve_from_progress(path):
    xs, ys = [], []
    with open(osp.join(path, "progress.txt")) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    for r in rows:
        xs.append(float(r["TotalEnvInteracts"]))
        ys.append(float(r["AverageEpRet"]))
    return xs, ys


def curve_from_csv(path):
    xs, ys = [], []
    with open(path) as f:
        for row in csv.reader(f):
            try:
                x, y = float(row[0]), float(row[1])
            except (ValueError, IndexError):
                continue
            xs.append(x)
            ys.append(y)
    return xs, ys


def milestones(xs, ys):
    out = {}
    for th in THRESHOLDS:
        out[th] = next((x for x, y in zip(xs, ys) if y >= th), None)
    return out


def fmt(v):
    return f"{v / 1e6:.2f}M" if v is not None else "--"


def main():
    print(f"{'curve':52s} " + " ".join(f">={t:<7d}" for t in THRESHOLDS)
          + "final")
    for arg in sys.argv[1:]:
        xs, ys = (curve_from_csv(arg) if arg.endswith(".csv")
                  else curve_from_progress(arg))
        ms = milestones(xs, ys)
        name = osp.basename(arg.rstrip("/"))
        print(f"{name:52s} " + " ".join(f"{fmt(ms[t]):8s}" for t in THRESHOLDS)
              + f"{ys[-1]:.1f} @ {fmt(xs[-1])}")


if __name__ == "__main__":
    main()
