"""Device mesh construction and sharding rules for the training step.

Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives):

- Mesh axes ``('dp', 'mp')``: replay batches shard along ``dp`` (pure data
  parallelism — the MARL gradient all-reduce rides ICI); model weight matrices
  shard their output/feature axis along ``mp`` (tensor parallelism for the
  wide hidden layers of exp2/exp3 configs).
- Parameters use a shape-driven rule: any leaf whose last axis divides the
  ``mp`` size is sharded on that axis; everything else is replicated.  Under
  ``jit`` with these input shardings XLA auto-partitions the whole
  forward/backward scan and inserts the psum/all-gathers.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, mp=1, gp=1, devices=None) -> Mesh:
    """Build a ('dp', 'mp'[, 'gp']) mesh over the first ``n_devices`` devices.

    'gp' is the graph-parallel axis (GT-slot/edge partitioning, see
    ``parallel.graph_parallel``); it is only materialized when ``gp > 1`` so
    existing two-axis call sites are unchanged.
    """
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    assert n % (mp * gp) == 0, f"n_devices={n} not divisible by mp*gp={mp * gp}"
    if gp > 1:
        grid = np.asarray(devices[:n]).reshape(n // (mp * gp), mp, gp)
        return Mesh(grid, ("dp", "mp", "gp"))
    grid = np.asarray(devices[:n]).reshape(n // mp, mp)
    return Mesh(grid, ("dp", "mp"))


def shard_params_spec(params, mesh: Mesh):
    """PartitionSpecs for a param pytree: last axis on 'mp' when divisible."""
    mp = mesh.shape["mp"]

    def rule(leaf):
        shape = np.shape(leaf)
        if mp > 1 and len(shape) >= 1 and shape[-1] % mp == 0 and shape[-1] >= mp:
            return P(*([None] * (len(shape) - 1) + ["mp"]))
        return P()

    return jax.tree_util.tree_map(rule, params)


def shard_batch_spec(batch, mesh: Mesh):
    """PartitionSpecs for a batch pytree: leading (batch) axis on 'dp'."""

    def rule(leaf):
        ndim = np.ndim(leaf)
        return P(*(["dp"] + [None] * (ndim - 1))) if ndim >= 1 else P()

    return jax.tree_util.tree_map(rule, batch)


def _named(tree_spec, mesh):
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), tree_spec,
                                  is_leaf=lambda x: isinstance(x, P))


def distribute_learner(learner, mesh: Mesh, graph_parallel=False):
    """Re-jit a :class:`RecurrentQLearner`'s update over ``mesh``.

    Parameters/optimizer state are placed with the 'mp' rule; each sampled
    batch is placed with the 'dp' rule before the jitted update runs.  The
    learner's ``batch_size`` must divide by the dp size.

    ``graph_parallel=True`` additionally registers the mesh's 'gp' axis so
    that encoders built with ``gat_backend='graph_parallel'`` route their
    GT-slot aggregation through the edge-partitioned shard_map path
    (``parallel.graph_parallel.gatv2_graph_parallel``) inside this update.
    """
    assert learner.batch_size % mesh.shape["dp"] == 0, \
        f"batch_size={learner.batch_size} must divide dp={mesh.shape['dp']}"
    if graph_parallel:
        assert "gp" in mesh.shape and mesh.shape["gp"] > 1, \
            "graph_parallel=True needs a mesh with a 'gp' axis (make_mesh(gp=...))"
        from uav_bs_ctrl_tpu.parallel.graph_parallel import set_graph_parallel_mesh
        set_graph_parallel_mesh(mesh, "gp")

    param_shardings = _named(shard_params_spec(learner.params, mesh), mesh)
    target_shardings = _named(shard_params_spec(learner.target_params, mesh), mesh)

    learner.params = jax.device_put(learner.params, param_shardings)
    learner.target_params = jax.device_put(learner.target_params, target_shardings)
    # Optimizer state mirrors parameter sharding leaf-by-leaf where shapes
    # match; scalars (step counts, injected hyperparams) replicate.
    opt_spec = jax.tree_util.tree_map(
        lambda leaf: shard_params_spec(leaf, mesh)
        if hasattr(leaf, "shape") else P(), learner.opt_state)
    learner.opt_state = jax.device_put(learner.opt_state, _named(opt_spec, mesh))

    inner_update = learner._update_fn
    jitted = jax.jit(inner_update, donate_argnums=(0, 1, 2))

    to_device = learner._batch_to_device

    def sharded_batch_to_device(batch):
        shardings = _named(shard_batch_spec(batch, mesh), mesh)
        return jax.device_put(batch, shardings)

    learner._batch_to_device = sharded_batch_to_device
    learner._update_jit = jitted
    learner._mesh = mesh
    return learner
