"""Multi-agent Q-learner (parity surface: reference ``algos/madrqn/learner.py``).

All heavy lifting lives in :class:`uav_bs_ctrl_tpu.algos.core.RecurrentQLearner`;
this subclass wires the madrqn agent-selection rule (reference ``:62-67``) and
the multi-agent cache semantics (shared reward mean under QMIX, ``:82-92``).
"""

from uav_bs_ctrl_tpu.algos.core import RecurrentQLearner
from uav_bs_ctrl_tpu.models.agents import build_agent


class MultiAgentQLearner(RecurrentQLearner):
    def __init__(self, env_info, args, seed=0):
        agent = build_agent(env_info["obs_shape"], env_info["n_actions"], args)
        super().__init__(env_info, args, agent, seed=seed)
