"""TPU-native graph compute primitives.

Two interchangeable data layouts cover the reference's DGL kernel surface
(SpMM / SDDMM / segment-softmax; reference use-sites
``algos/madrqn/agents/gnn_agents.py:144,189,226,261-266,298``):

- ``masked``: dense fixed-shape neighborhoods ([..., dst, src] masks) — the
  primary layout.  Every aggregation is a batched matmul/softmax that XLA
  tiles onto the MXU; "graphs" never change shape, so everything compiles
  once.
- ``segment``: padded edge lists (src, dst, mask) with segment reductions —
  the sparse path for scaled swarms, with XLA scatter and Pallas kernel
  backends.
"""

from uav_bs_ctrl_tpu.ops.masked import (
    masked_softmax,
    masked_mean,
    masked_sum,
    masked_max,
)
from uav_bs_ctrl_tpu.ops import segment
