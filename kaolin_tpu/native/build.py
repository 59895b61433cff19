"""Build the native host-side library (g++ → shared object).

Run: ``python -m kaolin_tpu.native.build``; :mod:`kaolin_tpu.native` also
builds on first use automatically.
"""

import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "kaolin_native.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "libkaolin_tpu_native.so")


def build(verbose=True):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return _OUT


def library_path():
    return _OUT


if __name__ == "__main__":
    build()
    print(f"built {_OUT}")
    sys.exit(0)
