"""Extract per-curve training data from the reference's exported figures.

The reference publishes no numeric results; its figures
(``/root/reference/export_figs/all-figs-exp{1,2,3}.pdf``) are
matplotlib output run through a distiller.  Curves survive as stroked
polylines (m/l/S operators) under per-object ``cm`` transforms, and tick
labels as ``Tm``-positioned text under one shared transform — enough to
recover the actual curve VALUES, which round-1 parity grading could only
guess from axis ranges (and over-guessed: e.g. exp3 4ubs tops at ~79 EpRet
(Disc-GNN), not the 200-250 axis band recorded in early BASELINE.md).

Writes benchmarks/ref_curves/<exp>_<panel>_<variant>.csv with columns
(step, value) and prints a summary table of smoothed finals.
"""

import os
import re
import zlib
from collections import defaultdict

FIGS = "/root/reference/export_figs"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_curves")

# Distiller palette -> variant names, verified against each figure's legend
# key-line colors (short stroked segments left of the legend labels).
COLOR2VARIANT = {
    "exp2": {
        (0.643, 0.541, 0.827): "iql",
        (0.11, 0.773, 0.996): "qmix",
        (0.435, 0.78, 0.812): "tarmac",
        (0.984, 0.635, 0.49): "disc",
    },
    "exp3": {
        (0.643, 0.541, 0.827): "iql_gnn",
        (0.11, 0.773, 0.996): "qmix_gnn",
        (0.435, 0.78, 0.812): "tarmac_gnn",
        (0.984, 0.635, 0.49): "disc_gnn",
        (0.984, 0.49, 0.502): "iql_mlp",
        (0.173, 0.078, 0.325): "qmix_mlp",
        (0.067, 0.298, 0.91): "tarmac_mlp",
        (0.055, 0.435, 0.486): "disc_mlp",
    },
    "exp1": {
        (0.643, 0.541, 0.827): "grp2_mlp",   # legend '10GTs MLP'
        (0.11, 0.773, 0.996): "grp2_gnn",
        (0.435, 0.78, 0.812): "grp3_mlp",
        (0.984, 0.635, 0.49): "grp3_gnn",
        (0.984, 0.49, 0.502): "grp4_mlp",
        (0.173, 0.078, 0.325): "grp4_gnn",
    },
}

# Shared text/graphics transform of these files (read off any text object).
CM = (0.8793535, 0, 0, -0.8793535, -116.7407, 687.2651)


def matmul(a, b):
    a1, b1, c1, d1, e1, f1 = a
    a2, b2, c2, d2, e2, f2 = b
    return (a1 * a2 + b1 * c2, a1 * b2 + b1 * d2, c1 * a2 + d1 * c2,
            c1 * b2 + d1 * d2, e1 * a2 + f1 * c2 + e2, e1 * b2 + f1 * d2 + f2)


def apply(m, x, y):
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


def parse_paths(s):
    tokens = re.findall(r"\([^)]*\)|<[^>]*>|-?\d*\.?\d+|[A-Za-z'\"\*]+|\[|\]", s)
    ctm, stack = (1, 0, 0, 1, 0, 0), []
    paths, color, nums, cur = [], (0, 0, 0), [], None
    for t in tokens:
        if re.fullmatch(r"-?\d*\.?\d+", t):
            nums.append(float(t))
            continue
        if t == "q":
            stack.append(ctm)
        elif t == "Q":
            ctm = stack.pop() if stack else (1, 0, 0, 1, 0, 0)
        elif t == "cm" and len(nums) >= 6:
            ctm = matmul(tuple(nums[-6:]), ctm)
        elif t == "SC" and len(nums) >= 3:
            color = tuple(round(v, 3) for v in nums[-3:])
        elif t == "m" and len(nums) >= 2:
            if cur and len(cur) > 1:
                paths.append((color, cur))
            cur = [apply(ctm, *nums[-2:])]
        elif t == "l" and len(nums) >= 2 and cur is not None:
            cur.append(apply(ctm, *nums[-2:]))
        elif t in ("S", "B", "s", "f", "b"):
            if cur and len(cur) > 1:
                paths.append((color, cur))
            cur = None
        nums = []
    return paths


def cal_from_anchors(x_anchors, y_anchors):
    (xd0, xv0), (xd1, xv1) = x_anchors
    (yd0, yv0), (yd1, yv1) = y_anchors

    def xmap(x):
        return xv0 + (x - xd0) / (xd1 - xd0) * (xv1 - xv0)

    def ymap(y):
        return yv0 + (y - yd0) / (yd1 - yd0) * (yv1 - yv0)

    return xmap, ymap


# Axis anchors in DEVICE space, read off the minor-tick-mark sequences (NOT
# the tick labels: label Tm coords are text BASELINES, ~3 device units below
# the tick centers, which inflated every value by ~+7 EpRet on the exp3 scale
# in the first extraction).  Validated by physics: a uniform-random policy
# measures EpRet = -1.2 on map 4ubs in both our NumPy and JAX envs, and with
# these anchors the reference curves' eps~1 starting points map to ~0, not +7.
# Each entry: ((dev, value), (dev, value)) for x and y.
CALS_DEV = {
    "exp1": dict(x=((48.70, 0.0), (175.33, 1.0e6)), y=((252.90, 0.0), (379.54, 200.0))),
    "exp2": dict(x=((48.75, 0.0), (175.52, 2.0e6)), y=((252.74, 0.0), (379.51, 300.0))),
    "exp3": dict(x=((49.77, 0.0), (176.40, 3.0e6)), y=((253.88, -50.0), (380.51, 250.0))),
}
# Calibrated training-curve panels per figure; exp1's later panels (test-return
# line plot, trajectory map, fairness) have different axes and are skipped.
PANELS = {"exp1": ["all_sizes"], "exp2": ["r400", "r800", "inf"],
          "exp3": ["4ubs", "6ubs", "8ubs"]}


def main():
    os.makedirs(OUT, exist_ok=True)
    summary = []
    for exp in ("exp1", "exp2", "exp3"):
        fn = f"{FIGS}/all-figs-{exp}.pdf"
        data = open(fn, "rb").read()
        streams = [zlib.decompress(x) for x in
                   re.findall(rb"stream\r?\n(.*?)endstream", data, re.S)]
        s = max(streams, key=len).decode("latin1")
        paths = parse_paths(s)
        xmap, ymap = cal_from_anchors(CALS_DEV[exp]["x"], CALS_DEV[exp]["y"])

        groups = defaultdict(list)
        for c, p in paths:
            if len(p) > 20:
                cx = sum(q[0] for q in p) / len(p)
                groups[round(cx / 100)].append((c, p))
        for pi, (gk, ps) in enumerate(sorted(groups.items())):
            if pi >= len(PANELS[exp]):
                continue  # uncalibrated panel (different axes)
            panel = PANELS[exp][pi]
            # Panels repeat at a fixed 258.65-device-unit pitch with identical
            # local axes; shift each back onto panel 1's x calibration.
            dx = pi * 258.65
            for c, p in ps:
                var = COLOR2VARIANT[exp].get(c, "unk" + str(c))
                rows = [(xmap(x - dx), ymap(y)) for x, y in p]
                path = os.path.join(OUT, f"{exp}_{panel}_{var}.csv")
                with open(path, "w") as f:
                    f.write("step,value\n")
                    for x, y in rows:
                        f.write(f"{x:.0f},{y:.3f}\n")
                tail = rows[int(len(rows) * 0.92):]
                fin = sum(v for _, v in tail) / len(tail)
                summary.append((exp, panel, var, fin, max(v for _, v in rows)))
    print(f"{'exp':6s} {'panel':6s} {'variant':12s} {'final':>8s} {'max':>8s}")
    for row in summary:
        print(f"{row[0]:6s} {row[1]:6s} {row[2]:12s} {row[3]:8.1f} {row[4]:8.1f}")


if __name__ == "__main__":
    main()
