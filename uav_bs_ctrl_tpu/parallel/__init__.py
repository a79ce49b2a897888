"""Multi-chip scaling: device meshes, sharded training steps, distributed init.

Replaces the reference's MPI scaffolding (``utils/mpi_tools.py`` /
``utils/mpi_pytorch.py`` — which the reference never actually wires into its
learners) with JAX-native SPMD that IS wired in: the jitted update runs over a
``jax.sharding.Mesh`` with the batch sharded along ``dp`` and model matrices
along ``mp``; XLA inserts the gradient all-reduces over ICI.
"""

from uav_bs_ctrl_tpu.parallel.mesh import (make_mesh, shard_batch_spec,
                                           shard_params_spec, distribute_learner)
