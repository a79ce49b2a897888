"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package covers the host-side
runtime the reference delegated to native libraries (DGL's C++ graph core and
schedulers): the env physics inner loop and the replay-buffer batch assembly.
Each component degrades gracefully to its NumPy twin when the shared library
has not been built (build with ``python -m uav_bs_ctrl_tpu.native.build``).
"""
