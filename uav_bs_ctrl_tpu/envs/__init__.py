"""Environment registry (parity with reference ``envs/__init__.py``)."""

REGISTRY = {}

from uav_bs_ctrl_tpu.envs.subs_cov import SingleUbsCoverageEnv
from uav_bs_ctrl_tpu.envs.mubs_cov import MultiUbsCoverageEnv

REGISTRY["SingleUbsCoverageEnv"] = SingleUbsCoverageEnv
REGISTRY["MultiUbsCoverageEnv"] = MultiUbsCoverageEnv
