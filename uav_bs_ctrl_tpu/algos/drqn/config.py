"""Default DRQN configuration (parity: reference ``algos/drqn/config.py``)."""

DEFAULT_CONFIG = {

    'device': 'tpu',
    'cuda_deterministic': False,

    'agent': 'rnn',        # Agent type ('rnn' | 'gnn')

    # Model parameters
    'hidden_size': 256,
    'n_layers': 2,
    'n_heads': 4,
    'compute_dtype': 'float32',  # 'bfloat16' -> mixed-precision net compute (MXU-native)
    'matmul_precision': None,    # None|'default'|'high'|'highest' (f32 TPU matmul passes)

    # Basic training hyperparameters
    'lr': 5e-4,
    'gamma': 0.99,
    'polyak': 0.999,
    'batch_size': 32,
    'replay_size': int(5e4),
    'decay_steps': int(2e5),
    'max_seq_len': 10,

    'steps_per_epoch': 10000,
    'epochs': 50,
    'update_after': 5000,
    'num_test_episodes': 5,
    'save_freq': 10,

    # Optimization techniques
    'anneal_lr': True,
}
