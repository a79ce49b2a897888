"""uav_bs_ctrl_tpu — a TPU-native (JAX/XLA/Pallas) framework for cooperative
UAV base-station trajectory design with heterogeneous-graph MARL.

Re-designed from scratch with the capabilities of the PyTorch/DGL reference
``zhangxiaochen95/uav_bs_ctrl`` (multi-agent recurrent Q-learning with
graph-attention observation encoding and graph-structured communication),
but architected TPU-first:

- Observations live as *dense masked neighborhoods* (fixed shapes, MXU-friendly
  batched attention) instead of dynamic DGL heterographs.
- A padded-CSR sparse path (Pallas SpMM/SDDMM/segment-softmax kernels) covers
  scaled swarm sizes.
- The full BPTT update (GRU unroll, double-Q, QMIX mixing, Polyak averaging,
  AdamW) is one jitted program using ``jax.lax.scan``.
- Multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` collectives.
"""

__version__ = "0.1.0"
