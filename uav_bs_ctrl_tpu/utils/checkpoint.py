"""Checkpoint backends: pickle (default, single-file) and Orbax (directory).

The reference persists ``state_dict`` pickles via ``th.save`` (reference
``algos/madrqn/learner.py:175-201``).  Here checkpoints are pytrees; the
pickle backend writes one ``.pt`` file with numpy leaves (same file-name
contract, ``checkpoint_epoch{N}.pt``), while the Orbax backend writes an
async-capable, multi-host-safe directory — use it for large swarm configs or
pod-slice runs.

The two backends are interchangeable: ``save``/``load`` dispatch on the path
(``.pt`` file -> pickle, otherwise Orbax directory).
"""

import os.path as osp
import pickle

import numpy as np

import jax


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save(path, checkpoint: dict):
    """Persist a checkpoint dict (scalars + pytrees of arrays).

    The pickle backend writes atomically (tmp file + ``os.replace``): a crash
    or SIGKILL mid-write must never leave a truncated ``checkpoint_epoch*.pt``
    behind, because the retry supervisor resumes from the NEWEST checkpoint
    and a corrupt one would crash every resume attempt.
    """
    if path.endswith(".pt"):
        import os
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(_to_numpy(checkpoint), f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return path

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(osp.abspath(path), _to_numpy(checkpoint))
    return path


def load(path) -> dict:
    if path.endswith(".pt"):
        with open(path, "rb") as f:
            return pickle.load(f)

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(osp.abspath(path))
