"""Subprocess entry point: decode and execute a pickled experiment thunk
(parity: reference ``utils/run_entrypoint.py``).

The repo root must be importable before unpickling — cloudpickle references
``uav_bs_ctrl_tpu.*`` modules by path.
"""

import base64
import os
import pickle
import sys
import zlib

BASE_DIR = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, BASE_DIR)

if __name__ == '__main__':
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('encoded_thunk')
    args = parser.parse_args()
    thunk = pickle.loads(zlib.decompress(base64.b64decode(args.encoded_thunk)))
    thunk()
