"""Direct head-to-head execution against the REFERENCE environment.

The reference env (``/root/reference/envs/mubs_cov/mubs_cov.py``) is pure
NumPy + gym-spaces; gym is not installed, so a minimal shim supplies the
three space classes it constructs (it never calls methods on them).  Layout
generation RNG sequences differ by design (documented in PARITY.md), so
layouts are pinned through ``map.set_positions`` on both sides; every step
of full episodes must then agree bit-exactly on rewards, per-agent obs,
global state, EpRet, and FairIdx.

This is the strongest env-parity evidence in the suite: the reference code
itself is executed, not re-read.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "envs/mubs_cov/mubs_cov.py")),
    reason="reference checkout not available")


def _install_gym_shim():
    if "gym" in sys.modules and not isinstance(sys.modules["gym"], types.ModuleType):
        return
    gym = types.ModuleType("gym")
    spaces = types.ModuleType("gym.spaces")

    class Discrete:
        def __init__(self, n):
            self.n = n

    class Box:
        def __init__(self, low=None, high=None, shape=None, dtype=np.float32, **kw):
            self.low, self.high, self.shape = low, high, shape

    class SpaceDict:
        def __init__(self, spaces=None, **kw):
            self.spaces = spaces or kw

    for name, export, cls in (("discrete", "Discrete", Discrete),
                              ("box", "Box", Box),
                              ("dict", "Dict", SpaceDict)):
        m = types.ModuleType(f"gym.spaces.{name}")
        setattr(m, export, cls)
        sys.modules[f"gym.spaces.{name}"] = m
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces
    gym.spaces = spaces


def _import_ref_env():
    _install_gym_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from envs.mubs_cov.mubs_cov import MultiUbsCoverageEnv as RefEnv
    return RefEnv


@pytest.mark.parametrize("map_id,n_eps", [("4ubs", 3), ("r400", 3), ("debug", 2)])
def test_reference_env_bit_exact(map_id, n_eps):
    RefEnv = _import_ref_env()
    from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv as OurEnv

    ref = RefEnv(map_id=map_id, fair_service=True, avoid_collision=True, record=False)
    ours = OurEnv(map_id=map_id, fair_service=True, avoid_collision=True,
                  record=False, use_native=False)

    rng = np.random.default_rng(7)
    for ep in range(n_eps):
        np.random.seed(900 + ep)
        fixed = ref.map.set_positions()
        fixed = {k: np.asarray(v, np.float32) for k, v in fixed.items()}
        ref.map.set_positions = lambda f=fixed: {k: v.copy() for k, v in f.items()}
        ours.map.set_positions = lambda f=fixed: {k: v.copy() for k, v in f.items()}
        ref.reset()
        ours.reset()
        np.testing.assert_array_equal(ref.pos_ubs, ours.pos_ubs)
        np.testing.assert_array_equal(ref.pos_gts, ours.pos_gts)

        done = False
        while not done:
            a = rng.integers(ref.n_actions, size=ref.n_agents)
            ro, rs, rr, rd, ri = ref.step(a.copy())
            uo, us, ur, ud, ui = ours.step(a.copy())
            np.testing.assert_array_equal(np.asarray(rr), np.asarray(ur))
            np.testing.assert_array_equal(np.asarray(rs), np.asarray(us))
            for i in range(ref.n_agents):
                for k in ("agent", "gt", "ubs"):
                    np.testing.assert_array_equal(np.asarray(ro[i][k]),
                                                  np.asarray(uo[i][k]), err_msg=f"{k}[{i}]")
            assert rd == ud and ri["BadMask"] == ui["BadMask"]
            done = rd
        assert ri["EpRet"] == ui["EpRet"]
        assert ri["FairIdx"] == ui["FairIdx"]


def test_reference_subs_env_bit_exact():
    """Single-UBS env (exp1): same-seed resets + identical action sequences."""
    RefEnv = _import_ref_env()
    from envs.subs_cov.subs_cov import SingleUbsCoverageEnv as RefSubs
    from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv as OurSubs

    ref = RefSubs(n_grps=2, gts_per_grp=5, record=False)
    ours = OurSubs(n_grps=2, gts_per_grp=5, record=False)
    rng = np.random.default_rng(3)
    for ep in range(2):
        np.random.seed(40 + ep)
        ref.reset()
        np.random.seed(40 + ep)
        ours.reset()
        np.testing.assert_array_equal(ref.pos_gts, ours.pos_gts)
        np.testing.assert_array_equal(ref.prior_gts, ours.prior_gts)
        for t in range(60):
            a = int(rng.integers(ref.n_actions))
            ro, rr, rd, ri = ref.step(a)
            uo, ur, ud, ui = ours.step(a)
            # Vectorized rate summation reorders float accumulation vs the
            # reference's per-GT loop: agree to ~1e-7 rel, not bitwise.
            np.testing.assert_allclose(rr, ur, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(ro["agent"]), np.asarray(uo["agent"]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(ro["gt"]), np.asarray(uo["gt"]),
                                       rtol=1e-5, atol=1e-6)
