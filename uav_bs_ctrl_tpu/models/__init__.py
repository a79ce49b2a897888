"""Model zoo: functional JAX modules (params are plain pytrees).

Covers the reference's activation-parity surface (SURVEY.md §2.3 D1-D10):
observation encoders, per-relation GATv2 attention, the five communication
protocols, dueling head, and the QMIX monotonic mixer.
"""

from uav_bs_ctrl_tpu.models import modules
from uav_bs_ctrl_tpu.models.agents import GnnAgent, RnnAgent, DrqnGnnAgent, build_agent
from uav_bs_ctrl_tpu.models.heads import QMixer
