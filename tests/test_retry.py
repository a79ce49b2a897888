"""Crash-retry supervisor of ``run_fast.py`` (``--retries``).

An unattended full-budget run must survive the rig's tunnel drops: the
supervisor (which holds no JAX backend) relaunches the training child with
``--resume`` after a crash, and the resumed run completes the full budget.
The reference's analog is per-variant subprocess isolation
(``utils/run_utils.py:170-184``); here the isolation also enables recovery.

Two failure modes are exercised end-to-end on tiny CPU configs:
  * an in-process exception (``UAVBS_TEST_CRASH_AT_ITER`` fault injection —
    stands in for a tunnel error raised from a jax call), and
  * SIGKILL of the training child mid-run (a hard client death).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_ARGS = [
    sys.executable, os.path.join(REPO, "run_fast.py"),
    "--exp", "exp2", "--map", "r400", "--c", "none", "--seed", "0",
    "--epochs", "2", "--steps-per-epoch", "2000", "--update-after", "500",
    "--replay-size", "200", "--n-worlds", "4", "--device", "cpu",
    "--save-freq", "1", "--retries", "2",
]
# 2000 steps/epoch at 4 worlds x T=40 -> 12 iters/epoch, 25 iters total;
# epoch-1 checkpoint lands at iter 11, so a crash at iter 13 resumes from it.
FULL_BUDGET_ROWS = 2


def run_env():
    env = dict(os.environ)
    env.pop("UAVBS_SUPERVISED", None)
    env.pop("UAVBS_TEST_CRASH_AT_ITER", None)
    return env


def progress_rows(data_dir):
    for root, _, files in os.walk(data_dir):
        if "progress.txt" in files:
            with open(os.path.join(root, "progress.txt")) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
            return lines[1:]  # drop header
    return []


def test_injected_crash_resumes_to_full_budget(tmp_path):
    env = run_env()
    env["UAVBS_TEST_CRASH_AT_ITER"] = "13"
    out = subprocess.run(
        BASE_ARGS + ["--data-dir", str(tmp_path)], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "relaunching with --resume" in out.stdout
    rows = progress_rows(tmp_path)
    assert len(rows) == FULL_BUDGET_ROWS
    assert rows[-1].split("\t")[0] == "2"  # final epoch logged


def test_sigkill_of_child_resumes_to_full_budget(tmp_path):
    env = run_env()
    sup = subprocess.Popen(
        BASE_ARGS + ["--data-dir", str(tmp_path)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # Wait for the first LOADABLE checkpoint, then SIGKILL the training
        # child.  Polling for existence alone was load-flaky (VERDICT r4):
        # on a busy host the kill could land with the file present but the
        # child still mid-epoch bookkeeping; requiring a clean unpickle (the
        # writer is atomic since r5) pins the resume point deterministically.
        import pickle
        deadline = time.time() + 300
        ckpt = None
        while time.time() < deadline and sup.poll() is None:
            for root, _, files in os.walk(tmp_path):
                for f in files:
                    if f.startswith("checkpoint_epoch") and f.endswith(".pt"):
                        try:
                            with open(os.path.join(root, f), "rb") as fh:
                                pickle.load(fh)
                            ckpt = f
                        except Exception:
                            pass
            if ckpt:
                break
            time.sleep(0.5)
        assert ckpt, "no loadable checkpoint appeared before the kill window"

        kids = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(sup.pid)],
            capture_output=True, text=True).stdout.split()
        assert kids, "supervisor has no child to kill"
        os.kill(int(kids[0]), signal.SIGKILL)

        out, _ = sup.communicate(timeout=600)
    finally:
        if sup.poll() is None:
            sup.kill()
    assert sup.returncode == 0, out[-2000:]
    assert "relaunching with --resume" in out
    rows = progress_rows(tmp_path)
    assert len(rows) == FULL_BUDGET_ROWS
    assert rows[-1].split("\t")[0] == "2"


def test_supervised_child_does_not_recurse():
    env = run_env()
    env["UAVBS_SUPERVISED"] = "1"
    env["UAVBS_TEST_CRASH_AT_ITER"] = "0"
    out = subprocess.run(
        BASE_ARGS + ["--data-dir", "/tmp/uavbs_norecurse"], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert out.returncode != 0
    assert "relaunching" not in out.stdout
