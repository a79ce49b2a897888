"""Fixed-shape ring replay buffer for recurrent agents.

TPU-first redesign of the reference's deque-of-python-lists buffers
(``algos/drqn/buffer.py``, ``algos/madrqn/buffer.py``): transitions accumulate
into a chunk of ``max_seq_len`` steps; completed chunks are written into
preallocated NumPy ring storage with static shapes, so sampling is a single
fancy-index gather producing contiguous [B, T(+1), ...] batches ready for
device transfer (one host->HBM copy per update).

Chunk semantics match the reference (SURVEY.md §2.4 quirks 5-6): sequence
fields (``obs``/``h``/``state``) store T+1 entries — the trailing entry is the
*next* obs/h/state after the final step — while ``act``/``rew``/``done`` store
T entries.  Hidden states are stored at collection time and seed BPTT without
burn-in.
"""

import numpy as np

import jax

SEQ_KEYS = ("obs", "h", "state")  # fields that carry the trailing next-value


class SequenceReplayBuffer:
    """Ring buffer of fixed-length transition chunks (pytree-valued fields)."""

    def __init__(self, capacity: int, max_seq_len: int):
        self.capacity = capacity
        self.max_seq_len = max_seq_len
        self._storage = None      # key -> pytree of np arrays [capacity, T(+1), ...]
        self._size = 0
        self._write_ptr = 0
        self._chunk = []          # list of transition dicts for the current chunk

    def __len__(self):
        return self._size

    def push(self, transition: dict):
        """Store one transition.

        ``transition`` keys: ``obs``/``h`` (pytrees), optional ``state``,
        ``act``, ``rew``, ``done`` plus ``next_obs``/``next_h``/
        [``next_state``] used only when the chunk completes.
        """
        self._chunk.append(transition)
        if len(self._chunk) == self.max_seq_len:
            self._commit_chunk()
            self._chunk = []

    def _commit_chunk(self):
        chunk = {}
        last = self._chunk[-1]
        keys = [k for k in ("obs", "h", "state", "act", "rew", "done") if k in last]
        for k in keys:
            steps = [tr[k] for tr in self._chunk]
            if k in SEQ_KEYS:
                steps = steps + [last["next_" + k]]
            # Stack over time: pytree leaves [T(+1), ...].
            chunk[k] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

        if self._storage is None:
            self._storage = jax.tree_util.tree_map(
                lambda x: np.zeros((self.capacity,) + np.shape(x), np.asarray(x).dtype), chunk)

        idx = self._write_ptr
        jax.tree_util.tree_map(lambda store, x: store.__setitem__(idx, x), self._storage, chunk)
        self._write_ptr = (self._write_ptr + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def push_chunks(self, chunks: dict):
        """Write a batch of completed chunks at once (device-collected path).

        ``chunks`` is a pytree with leaves [B, T(+1), ...] — the layout
        produced by ``algos.collect.collect_chunk``.
        """
        chunks = jax.tree_util.tree_map(np.asarray, chunks)
        n_new = jax.tree_util.tree_leaves(chunks)[0].shape[0]

        if self._storage is None:
            self._storage = jax.tree_util.tree_map(
                lambda x: np.zeros((self.capacity,) + x.shape[1:], x.dtype), chunks)

        idx = (self._write_ptr + np.arange(n_new)) % self.capacity
        jax.tree_util.tree_map(lambda store, x: store.__setitem__(idx, x),
                               self._storage, chunks)
        self._write_ptr = (self._write_ptr + n_new) % self.capacity
        self._size = min(self._size + n_new, self.capacity)

    def sample(self, batch_size: int, rng=None) -> dict:
        """Uniformly sample chunks -> pytree with leaves [B, T(+1), ...]."""
        rng = rng if rng is not None else np.random
        idx = rng.choice(self._size, size=batch_size, replace=False)
        return jax.tree_util.tree_map(lambda store: store[idx], self._storage)
