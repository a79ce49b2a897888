"""Single-agent recurrent Q-learner (parity: reference ``algos/drqn/learner.py``).

Agent dispatch by obs-shape type (int -> RnnAgent, dict -> single-relation
GATv2 agent; reference ``:48-52``); no mixer / double-Q / dueling.
"""

from uav_bs_ctrl_tpu.algos.core import RecurrentQLearner
from uav_bs_ctrl_tpu.models.agents import DrqnGnnAgent, RnnAgent


class QLearner(RecurrentQLearner):
    def __init__(self, env_info, args, seed=0):
        obs_shape = env_info["obs_shape"]
        if isinstance(obs_shape, int):
            agent = RnnAgent(obs_shape, env_info["n_actions"], args)
        else:
            agent = DrqnGnnAgent(obs_shape, env_info["n_actions"], args)
        env_info = dict(env_info, n_agents=1)
        super().__init__(env_info, args, agent, seed=seed)

    def cache(self, obs, h, act, rew, next_obs, next_h, done, bad_mask):
        super().cache(obs, h, None, [act], [rew], next_obs, next_h, None, done, bad_mask)
