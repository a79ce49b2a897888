"""Default MADRQN configuration (parity: reference ``algos/madrqn/config.py``)."""

DEFAULT_CONFIG = {

    'device': 'tpu',
    'cuda_deterministic': False,
    'cuda_index': 0,

    'o': 'mlp',            # Observation encoder type ('mlp' | 'gnn')
    'c': None,             # Comm protocol (None|'base'|'disc'|'commnet'|'tarmac'|'econv')
    'share_reward': False,

    # Model parameters
    'hidden_size': 64,
    'n_layers': 1,
    'n_heads': 4,
    'msg_size': 64,
    'key_size': 16,
    'n_rounds': 1,
    'embed_dim': 32,       # QMixer embedding dim
    # 'dense' (XLA masked softmax) | 'pallas_fused' (projection-fused flash
    # kernel, custom-VJP backward, VPU contractions) | 'pallas_fused_mxu'
    # (same, score/aggregation contractions on the MXU — 1.32x over XLA dense
    # at swarm scale, see benchmarks/RESULTS.md).  'pallas' (unfused
    # flash_gat) is inference/benchmark-only and rejected by
    # check_args_sanity for training configs.  Unknown values raise.
    'gat_backend': 'dense',
    # 'dense' | 'graph_parallel': partition the TarMAC talk-graph attention's
    # source-agent axis over the registered 'gp' mesh axis (the A^2-edge comm
    # relation; see parallel/graph_parallel.tarmac_attention_graph_parallel).
    'comm_backend': 'dense',
    # 'xla' | 'pallas': fuse the whole recurrent step (TarMAC comm + GRU +
    # head) into one Pallas kernel per scan iteration with a custom-VJP
    # backward (ops/step_kernels.py) — the lever for the latency-bound
    # scan-BPTT floor.  Requires c='tarmac', n_rounds=1.
    'step_backend': 'xla',
    'compute_dtype': 'float32',  # 'bfloat16' -> mixed-precision net compute (MXU-native)
    'matmul_precision': None,    # None|'default'|'high'|'highest' (f32 TPU matmul passes)

    # Basic training hyperparameters
    'lr': 5e-4,
    'gamma': 0.99,
    'polyak': 0.995,
    'batch_size': 32,
    'replay_size': int(5e3),
    'decay_steps': int(5e4),
    'max_seq_len': None,   # None -> episode_limit

    'steps_per_epoch': 4000,
    'epochs': 50,
    'update_after': 2000,
    'num_test_episodes': 5,
    'save_freq': 10,

    # Optimization techniques
    'anneal_lr': True,
    'norm_r': True,        # Kept for config parity; unwired (SURVEY.md quirk 1)
    'double_q': False,
    'dueling': False,
    'mixer': False,
}
