"""Shared algorithm utilities: config sanity, seeding.

Parity surface: reference ``algos/common.py`` — ``check_args_sanity``
(QMIX forces a shared scalar reward, reference ``:22-25``) and
``set_rand_seed``.  The reference's ``cat()`` polymorphism (torch.cat vs
dgl.batch, reference ``:40-47``) has no analog here: batching is a fixed-shape
leading axis by construction.
"""

import random

import numpy as np


def check_args_sanity(args):
    """Resolve device and enforce argument couplings."""
    device = getattr(args, "device", None)
    if device not in (None, "cpu", "tpu", "cuda"):
        args.device = device = "tpu"
    if device == "cpu":
        # Must win over the environment's default platform (e.g. a
        # sitecustomize-registered TPU backend); only effective before the
        # first backend initialization.
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    elif device == "cuda":
        # No CUDA here; the TPU is the accelerator.
        args.device = "tpu"

    if hasattr(args, "mixer") and args.mixer and not args.share_reward:
        args.share_reward = True
        print("Since QMix is used, all agents are forced to share a scalar reward.")

    compute_dtype = getattr(args, "compute_dtype", "float32")
    if compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"compute_dtype must be 'float32' or 'bfloat16', "
                         f"got {compute_dtype!r}")

    # Matmul precision: on TPU, DEFAULT precision lowers f32 matmuls to bf16
    # MXU passes (~1e-2 rel error — reference CUDA math is true f32);
    # 'highest' forces true-f32 passes, 'high' = bf16_3x (~1e-4).  None keeps
    # the process default (benchmarks/RESULTS.md round-5 takeoff study).
    mm_prec = getattr(args, "matmul_precision", None)
    if mm_prec not in (None, "default", "high", "highest"):
        raise ValueError(f"matmul_precision must be None|'default'|'high'|"
                         f"'highest', got {mm_prec!r}")
    if mm_prec and mm_prec != "default":
        import jax
        jax.config.update("jax_default_matmul_precision", mm_prec)

    # gatv2() falls through to the dense path on an unrecognized string, so a
    # typo'd backend would silently lose the custom kernel — fail loudly here.
    gat_backend = getattr(args, "gat_backend", "dense")
    if gat_backend not in ("dense", "pallas", "pallas_fused",
                           "pallas_fused_mxu", "graph_parallel"):
        raise ValueError(
            f"gat_backend must be one of 'dense'|'pallas'|'pallas_fused'|"
            f"'pallas_fused_mxu'|'graph_parallel', got {gat_backend!r}")
    comm_backend = getattr(args, "comm_backend", "dense")
    if comm_backend not in ("dense", "graph_parallel"):
        raise ValueError(f"comm_backend must be 'dense' or 'graph_parallel', "
                         f"got {comm_backend!r}")

    step_backend = getattr(args, "step_backend", "xla")
    if step_backend not in ("xla", "pallas"):
        raise ValueError(f"step_backend must be 'xla' or 'pallas', "
                         f"got {step_backend!r}")
    if step_backend == "pallas":
        # The fused recurrent-step kernel (ops/step_kernels.py) implements
        # exactly the flagship step: TarMAC comm (1 round) + GRU + head.  A
        # silent fallback would misreport what ran; fail loudly instead.
        if getattr(args, "c", None) != "tarmac" or getattr(args, "n_rounds", 1) != 1:
            raise ValueError("step_backend='pallas' requires c='tarmac' and "
                             "n_rounds=1 (the fused recurrent-step kernel "
                             "covers the TarMAC+GRU+head step only)")
        if comm_backend != "dense":
            raise ValueError("step_backend='pallas' and "
                             "comm_backend='graph_parallel' are mutually "
                             "exclusive (the fused step kernel is single-"
                             "device; shard the batch axis instead)")
    if gat_backend == "pallas":
        # flash_gat has no custom VJP; inside the differentiated update it
        # would fail (or worse, appear to work via a fallback).  Training
        # configs must use the fused kernels, which carry a flash-recompute
        # backward.
        raise ValueError(
            "gat_backend='pallas' (unfused flash_gat) is inference/benchmark "
            "only — it has no custom VJP.  Use 'pallas_fused' or "
            "'pallas_fused_mxu' for training, or call "
            "models.encoders.gatv2(..., backend='pallas') directly.")

    return args


def enable_persistent_compilation_cache(path: str = None):
    """Cache compiled XLA executables on disk across processes.

    On the tunneled TPU rig a cold compile of the fused training program costs
    10-20 minutes; the persistent cache makes repeat launches (resume, new
    seeds of the same variant, bench re-runs) near-instant.  Path resolution:
    explicit arg > $JAX_COMPILATION_CACHE_DIR > ~/.cache/jax_pcc.  Failures
    are logged (not swallowed) so cache misconfiguration stays visible.
    """
    import os
    import sys
    import jax
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/jax_pcc"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        print(f"warning: persistent compilation cache disabled ({e})",
              file=sys.stderr)


def set_rand_seed(seed: int):
    """Seed the host-side RNGs (Python, NumPy). JAX keys are derived per-learner."""
    random.seed(seed)
    np.random.seed(seed)
