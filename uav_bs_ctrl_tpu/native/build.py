"""Build the native runtime library: ``python -m uav_bs_ctrl_tpu.native.build``."""

import os.path as osp
import subprocess
import sys


def build(verbose=True):
    here = osp.dirname(osp.abspath(__file__))
    src = [osp.join(here, "env_core.cpp"), osp.join(here, "replay_core.cpp")]
    src = [s for s in src if osp.exists(s)]
    out = osp.join(here, "libuavbs.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", out] + src
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    if verbose:
        print(f"Built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
