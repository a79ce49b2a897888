"""Multi-host distributed runtime.

Replaces the reference's MPI layer (``utils/mpi_tools.py``: ``mpi_fork``
re-exec, ``Allreduce``/``Bcast`` wrappers, cross-rank statistics) with
JAX-native equivalents that are actually wired into training:

- ``init_distributed``    — ``jax.distributed.initialize`` per host (the
  coordinator address/process-id come from env vars or args), replacing the
  ``mpirun`` relaunch.
- ``dist_statistics_scalar`` — cross-host mean/std/min/max via a tiny jitted
  psum over the global device mesh (replacing ``mpi_statistics_scalar``,
  reference ``utils/mpi_tools.py:78-98``), used by the EpochLogger on pods.
- gradient all-reduce needs no helper at all: the dp-sharded jitted update
  (``parallel.mesh``) lets XLA insert the psum over ICI/DCN — the reference's
  ``mpi_avg_grads``/``sync_params`` pair existed but was never called by any
  learner (SURVEY.md §2.4 quirk 2); here the equivalent is structural.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX distributed across hosts (no-op if single-host).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); returns (process_id, num_processes).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))

    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def num_hosts() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def dist_statistics_scalar(x, with_min_and_max=False):
    """Cross-host mean/std (and min/max) of per-host scalar samples.

    Single-host: pure NumPy.  Multi-host: global sums via ``psum`` over all
    devices (each host contributes its local sum once).
    """
    x = np.asarray(x, dtype=np.float32)
    if num_hosts() == 1:
        mean = x.mean() if x.size else 0.0
        std = np.sqrt(np.mean((x - mean) ** 2)) if x.size else 0.0
        if with_min_and_max:
            return (mean, std, x.min() if x.size else np.inf,
                    x.max() if x.size else -np.inf)
        return mean, std

    from jax.experimental.multihost_utils import process_allgather
    gathered = process_allgather(jnp.asarray(local_stat_row(x)))
    return combine_host_stats(np.asarray(gathered), with_min_and_max)


def local_stat_row(x):
    """This host's contribution to the cross-host statistics allgather."""
    x = np.asarray(x, dtype=np.float64)
    return [x.sum(), float(x.size), np.sum(x ** 2),
            x.min() if x.size else np.inf, x.max() if x.size else -np.inf]


def combine_host_stats(sums, with_min_and_max=False):
    """Combine allgathered per-host rows ``[sum, n, sum_sq, min, max]``.

    The reference computes residuals around the GLOBAL mean
    (``utils/mpi_tools.py:88-91``: allreduce the mean first, then allreduce
    ``sum((x - global_mean)**2)``).  ``E[(x-mu)^2] = E[x^2] - mu^2`` yields the
    exact same quantity from raw second moments in a single collective.
    """
    sums = np.asarray(sums, dtype=np.float64)
    global_sum, global_n = sums[:, 0].sum(), sums[:, 1].sum()
    mean = global_sum / max(global_n, 1)
    var = max(sums[:, 2].sum() / max(global_n, 1) - mean ** 2, 0.0)
    std = np.sqrt(var)
    if with_min_and_max:
        return mean, std, sums[:, 3].min(), sums[:, 4].max()
    return mean, std
