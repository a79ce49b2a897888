"""Dedupe a resumed progress.txt that re-covered epochs from an older checkpoint.

When a run is resumed from a checkpoint older than the last logged epoch (e.g.
only the epoch-100 checkpoint of a 150-epoch run was committed), the appending
EpochLogger writes a second copy of the re-covered epochs.  This keeps the LAST
occurrence of every epoch number — the lineage that continues into the new
rows — so TotalEnvInteracts is monotonic again for plotting/scorecard.

Usage: python benchmarks/dedupe_progress.py <progress.txt> [...]
Rewrites in place; prints a one-line summary per file.
"""
import sys


def dedupe(path):
    with open(path) as f:
        lines = f.read().splitlines()
    header, rows = lines[0], lines[1:]
    last = {}
    for i, r in enumerate(rows):
        epoch = int(float(r.split("\t", 1)[0]))
        last[epoch] = i
    keep = sorted(last.items())
    out = [header] + [rows[i] for _, i in keep]
    dropped = len(rows) - len(keep)
    if dropped:
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
    print(f"{path}: {len(rows)} rows -> {len(keep)} (dropped {dropped} "
          f"superseded re-covered rows)")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        dedupe(p)
