"""Profiler trace of the flagship update: per-kernel device-time table.

VERDICT r4 item 4: answer where the encoder forward's time actually goes
(it measured 15x its matmul bound pre-r5).  Captures a ``jax.profiler`` trace
of several flagship updates (the exact bench.py workload), parses the xplane
in-process with ``jax.profiler.ProfileData``, and prints

  * the top-k XLA ops by total device time,
  * totals per category (fusion / matmul-convolution / Pallas-custom-call /
    copy-infeed / other),
  * device busy time per update vs the wall-clock update time (gap = host/
    dispatch/launch latency).

Usage: python benchmarks/bench_trace.py [n_updates]   (on the TPU)
Env: BENCH_B / BENCH_DTYPE etc. as for bench.py.
"""

import collections
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_updates = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp
    import bench

    learner = bench.setup_learner()
    m = learner.update()                       # compile + warmup
    log(f"warmup LossQ={m['LossQ']:.4f}")

    batch = learner._batch_to_device(learner.buffer.sample(learner.batch_size))
    params, targets, opt_state = (learner.params, learner.target_params,
                                  learner.opt_state)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1.0)
    params, targets, opt_state, m = learner._update_jit(
        params, targets, opt_state, batch, key, lr)
    _ = float(m["LossQ"])

    logdir = "/tmp/uavbs_trace"
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(n_updates):
        params, targets, opt_state, m = learner._update_jit(
            params, targets, opt_state, batch, key, lr)
    _ = float(m["LossQ"])
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) / n_updates * 1e3

    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert files, f"no xplane capture under {logdir}"
    pd = jax.profiler.ProfileData.from_file(files[-1])

    per_op = collections.Counter()
    device_planes = [p for p in pd.planes
                     if not p.name.startswith("/host") and "Task" not in p.name]
    for plane in device_planes:
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns or 0

    def category(name):
        n = name.lower()
        if "fusion" in n:
            return "fusion"
        if any(k in n for k in ("dot", "conv", "matmul")):
            return "matmul"
        if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
            return "pallas/custom-call"
        if any(k in n for k in ("copy", "infeed", "outfeed", "transpose",
                                "bitcast", "reshape")):
            return "data-movement"
        return "other"

    cats = collections.Counter()
    for name, ns in per_op.items():
        cats[category(name)] += ns
    total_ns = sum(per_op.values())

    log(f"\ndevice planes: {[p.name for p in device_planes]}")
    log(f"{'op':70s} {'ms/upd':>8s} {'%':>6s}")
    for name, ns in per_op.most_common(30):
        log(f"{name[:70]:70s} {ns / 1e6 / n_updates:8.3f} "
            f"{100 * ns / max(total_ns, 1):6.2f}")
    log("\ncategories:")
    for name, ns in cats.most_common():
        log(f"  {name:24s} {ns / 1e6 / n_updates:8.3f} ms/upd "
            f"{100 * ns / max(total_ns, 1):6.2f}%")

    print(json.dumps({
        "n_updates": n_updates,
        "wall_ms_per_update": round(wall_ms, 2),
        "device_busy_ms_per_update": round(total_ns / 1e6 / n_updates, 2),
        "categories_ms_per_update": {k: round(v / 1e6 / n_updates, 3)
                                     for k, v in cats.items()},
        "top10": [{"op": n[:80], "ms": round(ns / 1e6 / n_updates, 3)}
                  for n, ns in per_op.most_common(10)],
    }))


if __name__ == "__main__":
    main()
