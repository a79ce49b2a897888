"""Dynamic learning parity: our jitted update vs torch-autograd reference twin.

Round-4/5 exp3 investigation (VERDICT r4 item 1c): static audits (init
distributions, optimizer math, activation parity) cannot catch a systematic
*learning-dynamics* divergence — a subtly different gradient path, clip
timing, Polyak placement, or weight-decay semantics would only show up as
trajectory drift over many updates.  This test runs the full MADRQN
GNN+TarMAC double-Q update (the exp3 flagship family) for 60 optimizer steps
in BOTH stacks from identical weights on identical batch streams and asserts
the loss trajectories track.

The torch twin replicates the reference semantics exactly
(``/root/reference/algos/madrqn/learner.py:95-171``): policy unroll T+1 /
target unroll offset by one with stored h[1], double-Q argmax from the SAME
policy unroll (detached), MSE, value-clip on policy params, AdamW
(torch default weight_decay 0.01), Polyak 0.999 — and the reference agent
detach quirk (comm inputs use h.detach(), ``gnn_agents.py:254``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from types import SimpleNamespace as SN

ATOL = 2e-5

# Tiny exp3-family shape: keeps 60 torch BPTT updates CPU-cheap.
A, M, K = 3, 5, 2
NF_GT, NF_UBS = 4, 3           # flag + features
HID, HEADS, MSG, KEYSZ = 16, 2, 8, 4
N_ACT = 5
T, B = 6, 6
GAMMA, LR, POLYAK = 0.99, 2.5e-4, 0.999
N_UPDATES = 60


def t(x):
    return torch.as_tensor(np.asarray(x))


def _inject_linear(mod, p):
    with torch.no_grad():
        mod.weight.copy_(t(p["w"]).T)
        mod.bias.copy_(t(p["b"]))


def _inject_gru(cell, p):
    with torch.no_grad():
        cell.weight_ih.copy_(t(p["wi"]).T)
        cell.weight_hh.copy_(t(p["wh"]).T)
        cell.bias_ih.copy_(t(p["bi"]))
        cell.bias_hh.copy_(t(p["bh"]))


class GATRel(torch.nn.Module):
    """Torch twin of models.encoders.gatv2 (dense masked path, with residual)."""

    def __init__(self, d_src, d_dst):
        super().__init__()
        self.fc_src = torch.nn.Linear(d_src, HID)
        self.fc_dst = torch.nn.Linear(d_dst, HID)
        self.attn = torch.nn.Parameter(torch.randn(HEADS, HID // HEADS))
        self.res_fc = torch.nn.Linear(d_dst, HID)

    def forward(self, x_src, x_dst, mask):
        fh = HID // HEADS
        el = self.fc_src(x_src)                               # [..., M, HID]
        er = self.fc_dst(x_dst)                               # [..., HID]
        e = F.leaky_relu(el.reshape(el.shape[:-1] + (HEADS, fh))
                         + er.reshape(er.shape[:-1] + (1, HEADS, fh)), 0.2)
        scores = (e * self.attn).sum(-1)                      # [..., M, H]
        scores = scores.masked_fill(~mask.unsqueeze(-1), -1e30)
        alpha = torch.softmax(scores, dim=-2)
        ft = (alpha.unsqueeze(-1)
              * el.reshape(el.shape[:-1] + (HEADS, fh))).sum(-3)
        return torch.relu(ft.flatten(-2) + self.res_fc(x_dst))


class TorchFlagship(torch.nn.Module):
    """GraphObservationEncoder + 1-round TarMAC + GRU + linear head."""

    def __init__(self):
        super().__init__()
        self.seen = GATRel(NF_GT - 1, 2)
        self.near = GATRel(NF_UBS - 1, 2)
        self.aggr = torch.nn.Linear(2 * HID, HID)
        self.f_val = torch.nn.Linear(2 * HID, MSG)
        self.f_sign = torch.nn.Linear(2 * HID, KEYSZ)
        self.f_que = torch.nn.Linear(2 * HID, KEYSZ)
        self.f_udt = torch.nn.GRUCell(HID + MSG, HID)
        self.f_out = torch.nn.Linear(HID, N_ACT)

    def forward(self, obs, h):
        x_gt = self.seen(obs["gt"][..., 1:], obs["agent"], obs["gt"][..., 0] > 0)
        x_ubs = self.near(obs["ubs"][..., 1:], obs["agent"], obs["ubs"][..., 0] > 0)
        x = torch.relu(self.aggr(torch.cat([x_gt, x_ubs], -1)))
        # TarMAC round (reference gnn_agents.py:248-271; h detached in inputs).
        inputs = torch.cat([x, h.detach()], -1)
        v, s, q = self.f_val(inputs), self.f_sign(inputs), self.f_que(inputs)
        scores = torch.einsum("bsk,bdk->bsd", s, q) / KEYSZ
        scores = scores.masked_fill(~obs["adj"], -1e30)
        alpha = torch.softmax(scores, dim=-2)                 # over sources
        c = torch.einsum("bsd,bsm->bdm", alpha, v)
        h2 = self.f_udt(torch.cat([x, c], -1).reshape(-1, HID + MSG),
                        h.reshape(-1, HID)).reshape(B, A, HID)
        return self.f_out(h2), h2


def _inject_flagship(net, p):
    for rel in ("seen", "near"):
        mod = getattr(net, rel)
        _inject_linear(mod.fc_src, p["enc"][rel]["fc_src"])
        _inject_linear(mod.fc_dst, p["enc"][rel]["fc_dst"])
        _inject_linear(mod.res_fc, p["enc"][rel]["res_fc"])
        with torch.no_grad():
            mod.attn.copy_(t(p["enc"][rel]["attn"]))
    _inject_linear(net.aggr, p["enc"]["aggr"])
    _inject_linear(net.f_val, p["f_comm"]["f_val"])
    _inject_linear(net.f_sign, p["f_comm"]["f_sign"])
    _inject_linear(net.f_que, p["f_comm"]["f_que"])
    _inject_gru(net.f_udt, p["f_comm"]["f_udt"])
    _inject_linear(net.f_out, p["f_out"])


def _synth_batches(rng, n_batches):
    """Batch streams in both layouts (ours batch-major dict / torch per-t)."""
    batches = []
    for _ in range(n_batches):
        def obs_block(prefix):
            gt_flag = (rng.random(prefix + (A, M, 1)) > 0.3).astype(np.float32)
            gt_flag[..., 0, :] = 1.0  # every agent sees >= 1 GT
            ubs_flag = (rng.random(prefix + (A, K, 1)) > 0.3).astype(np.float32)
            ubs_flag[..., 0, :] = 1.0
            return {
                "agent": rng.normal(size=prefix + (A, 2)).astype(np.float32),
                "gt": np.concatenate(
                    [gt_flag, rng.normal(size=prefix + (A, M, NF_GT - 1))
                     .astype(np.float32)], -1),
                "ubs": np.concatenate(
                    [ubs_flag, rng.normal(size=prefix + (A, K, NF_UBS - 1))
                     .astype(np.float32)], -1),
                "adj": np.ones(prefix + (A, A), dtype=bool),
            }
        batches.append(dict(
            obs=obs_block((B, T + 1)),
            act=rng.integers(N_ACT, size=(B, T, A)).astype(np.int32),
            rew=rng.normal(size=(B, T, A)).astype(np.float32),
            done=np.zeros((B, T), np.float32),
            h=np.zeros((B, 2, A, HID), np.float32),
        ))
    return batches


def _torch_update(policy, target, opt, batch):
    obs_t = [{k: (t(v[:, i]) if k != "adj" else t(v[:, i]).bool())
              for k, v in batch["obs"].items()} for i in range(T + 1)]
    acts = t(batch["act"]).long().unsqueeze(-1)               # [B, T, A, 1]
    rews = t(batch["rew"])

    h = torch.zeros(B, A, HID)
    h_targ = torch.zeros(B, A, HID)
    agent_out, target_out = [], []
    for i in range(T):
        q, h = policy(obs_t[i], h)
        agent_out.append(q)
        with torch.no_grad():
            qn, h_targ = target(obs_t[i + 1], h_targ)
            target_out.append(qn)
    q, h = policy(obs_t[T], h)
    agent_out.append(q)
    agent_out = torch.stack(agent_out, dim=1)                 # [B, T+1, A, n]
    target_out = torch.stack(target_out, dim=1)               # [B, T, A, n]

    qvals = agent_out[:, :-1].gather(-1, acts).squeeze(-1)
    next_acts = agent_out[:, 1:].detach().argmax(-1, keepdim=True)
    next_vals = target_out.gather(-1, next_acts).squeeze(-1)
    loss = F.mse_loss(qvals, rews + GAMMA * next_vals)

    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_value_(policy.parameters(), 1)
    opt.step()
    with torch.no_grad():
        for p, p_t in zip(policy.parameters(), target.parameters()):
            p_t.mul_(POLYAK).add_((1 - POLYAK) * p)
    return float(loss.detach())


def test_update_dynamics_track_torch_reference():
    from uav_bs_ctrl_tpu.algos.common import check_args_sanity
    from uav_bs_ctrl_tpu.algos.madrqn.config import DEFAULT_CONFIG
    from uav_bs_ctrl_tpu.algos.madrqn.learner import MultiAgentQLearner

    cfg = dict(DEFAULT_CONFIG)
    cfg.update(o="gnn", c="tarmac", hidden_size=HID, n_heads=HEADS,
               msg_size=MSG, key_size=KEYSZ, n_rounds=1, n_layers=2,
               batch_size=B, max_seq_len=T, double_q=True, dueling=False,
               mixer=False, lr=LR, gamma=GAMMA, polyak=POLYAK,
               replay_size=64, device="cpu")
    args = check_args_sanity(SN(**cfg))
    env_info = dict(obs_shape=dict(agent=2, gt=NF_GT - 1, ubs=NF_UBS - 1),
                    state_shape=A * 2, n_actions=N_ACT, n_agents=A,
                    episode_limit=T)
    learner = MultiAgentQLearner(env_info, args, seed=0)

    torch.manual_seed(0)
    policy, target = TorchFlagship(), TorchFlagship()
    _inject_flagship(policy, learner.params["net"])
    target.load_state_dict(policy.state_dict())
    opt = torch.optim.AdamW(policy.parameters(), lr=LR)  # wd 0.01 default

    rng = np.random.default_rng(42)
    batches = _synth_batches(rng, 4)

    params, targets, opt_state = (learner.params, learner.target_params,
                                  learner.opt_state)
    key = jax.random.PRNGKey(0)
    lr_scale = jnp.float32(1.0)

    losses_jax, losses_torch = [], []
    for step in range(N_UPDATES):
        batch = batches[step % len(batches)]
        jb = {k: (jax.tree_util.tree_map(jnp.asarray, v) if k == "obs"
                  else jnp.asarray(v)) for k, v in batch.items()}
        params, targets, opt_state, m = learner._update_jit(
            params, targets, opt_state, jb, key, lr_scale)
        losses_jax.append(float(m["LossQ"]))
        losses_torch.append(_torch_update(policy, target, opt, batch))

    losses_jax = np.array(losses_jax)
    losses_torch = np.array(losses_torch)
    rel = np.abs(losses_jax - losses_torch) / np.maximum(losses_torch, 1e-6)

    # First update: pure forward/backward/AdamW-step parity (tight).
    assert rel[0] < 2e-4, (losses_jax[0], losses_torch[0])
    # Early trajectory: framework round-off only (no drift).
    assert rel[:20].max() < 2e-3, rel[:20].max()
    # Long horizon: round-off amplifies through BPTT/argmax, but any
    # systematic divergence (clip/decay/Polyak/lr semantics) would blow
    # through this band within 60 updates.
    assert rel.max() < 0.05, (rel.argmax(), rel.max())
    # Learning direction: both stacks reduce the TD loss comparably.
    assert losses_jax[-5:].mean() < losses_jax[:5].mean()
    assert abs(losses_jax[-5:].mean() - losses_torch[-5:].mean()) \
        / losses_torch[-5:].mean() < 0.05
