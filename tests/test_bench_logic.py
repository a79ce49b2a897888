"""bench.py logic check on CPU with shrunken sizes (the driver runs the real
thing on TPU at round end; this guards the code path)."""

import json
import subprocess
import sys

import numpy as np


def test_bench_runs_small(monkeypatch, tmp_path):
    import bench

    monkeypatch.setattr(bench, "A", 3)
    monkeypatch.setattr(bench, "M", 6)
    monkeypatch.setattr(bench, "K", 2)
    monkeypatch.setattr(bench, "HID", 32)
    monkeypatch.setattr(bench, "MSG", 16)
    monkeypatch.setattr(bench, "KEYSZ", 8)
    monkeypatch.setattr(bench, "B", 4)
    monkeypatch.setattr(bench, "T", 5)
    monkeypatch.setattr(bench, "STATE_DIM", 3 * 2 + 6 * 4)
    monkeypatch.setattr(bench, "EDGES_PER_UPDATE", 4 * 11 * 3 * (6 + 2 + 3))
    monkeypatch.setattr(bench, "TRAIN_KW", dict(
        o="gnn", c="tarmac", hidden_size=32, msg_size=16, key_size=8,
        n_heads=4, n_layers=2, batch_size=4, max_seq_len=5,
        double_q=True, dueling=True, replay_size=16, device="cpu"))

    tpu_edges = bench.bench_tpu(n_timed=2)
    assert np.isfinite(tpu_edges) and tpu_edges > 0


def test_bench_json_contract():
    """The final print must be exactly one JSON line with the driver schema."""
    import bench
    import io
    import contextlib

    out = io.StringIO()
    payload = {"metric": "m", "value": 1, "unit": "u", "vs_baseline": 2.0}
    with contextlib.redirect_stdout(out):
        print(json.dumps(payload))
    line = out.getvalue().strip()
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline"}
