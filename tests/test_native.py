"""Native C++ env core vs the NumPy reference implementation: exact agreement."""

import numpy as np
import pytest

from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv
from uav_bs_ctrl_tpu.native import env_core

pytestmark = pytest.mark.skipif(not env_core.available(),
                                reason="native library not built")


@pytest.mark.parametrize("map_id,steps", [("debug", 10), ("4ubs", 10), ("8ubs", 6)])
def test_native_matches_numpy_rollout(map_id, steps):
    """Run identical rollouts through both schedulers; all state must agree."""
    def rollout(use_native):
        np.random.seed(123)
        env = MultiUbsCoverageEnv(map_id=map_id, record=False, use_native=use_native)
        if use_native:
            assert env._native is not None, "native core not active"
        env.reset()
        out = []
        for t in range(steps):
            acts = np.random.randint(env.n_actions, size=env.n_agents)
            _, state, rew, _, info = env.step(acts)
            out.append((env.sched.copy(), env.rate_per_gt.copy(),
                        env.rate_per_ubs.copy(), rew.copy(), state.copy()))
        return out

    ref = rollout(False)
    nat = rollout(True)
    for t, ((s0, rg0, ru0, r0, st0), (s1, rg1, ru1, r1, st1)) in enumerate(zip(ref, nat)):
        np.testing.assert_array_equal(s0, s1, err_msg=f"sched mismatch @t={t}")
        np.testing.assert_allclose(rg0, rg1, rtol=1e-6, err_msg=f"rate_gt @t={t}")
        np.testing.assert_allclose(ru0, ru1, rtol=1e-6, err_msg=f"rate_ubs @t={t}")
        np.testing.assert_allclose(r0, r1, rtol=1e-6, err_msg=f"reward @t={t}")
        np.testing.assert_allclose(st0, st1, rtol=1e-6, err_msg=f"state @t={t}")


def test_native_speedup_measured():
    """The native scheduler must not be slower than NumPy on the big map."""
    import time
    np.random.seed(0)
    env_np = MultiUbsCoverageEnv(map_id="8ubs", record=False, use_native=False)
    env_nat = MultiUbsCoverageEnv(map_id="8ubs", record=False, use_native=True)
    if env_nat._native is None:
        pytest.skip("native core unavailable")

    for env in (env_np, env_nat):
        np.random.seed(0)
        env.reset()

    def time_steps(env, n=30):
        t0 = time.perf_counter()
        for _ in range(n):
            env.step(np.zeros(env.n_agents, dtype=int))
        return time.perf_counter() - t0

    t_np = time_steps(env_np)
    t_nat = time_steps(env_nat)
    print(f"numpy {t_np:.4f}s vs native {t_nat:.4f}s "
          f"({t_np / max(t_nat, 1e-9):.1f}x)")
    assert t_nat <= t_np * 1.5  # at minimum, no regression
