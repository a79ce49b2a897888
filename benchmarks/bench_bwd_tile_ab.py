"""Hardware sweep: flash-GAT backward row-tile at the slot-sized tile_m.

Round 4 swept UAVBS_GAT_BWD_TILE at tile_m=128 and found it flat; the
round-5 slot-sized tiles shrink the backward block footprint 2-8x, so the
optimum may have moved.  Runs bench.bench_tpu at several bwd tile_n values.

Usage: python benchmarks/bench_bwd_tile_ab.py [tiles...]   (default 8 16 32)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    res = {}
    for tn in tiles:
        os.environ["UAVBS_GAT_BWD_TILE"] = str(tn)
        # bench caches jitted programs per-process; fork per setting.
        pid = os.fork()
        if pid == 0:
            import bench
            e = bench.bench_tpu(n_timed=15)
            with open(f"/tmp/bwd_tile_{tn}.json", "w") as f:
                json.dump(dict(edges_per_s=round(e), **bench.LAST_EXTRAS), f)
            os._exit(0)
        os.waitpid(pid, 0)
        with open(f"/tmp/bwd_tile_{tn}.json") as f:
            res[f"tile_{tn}"] = json.load(f)
        print(f"tile_n={tn}: {res[f'tile_{tn}']}", file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
