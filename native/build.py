"""Build the seedvr2 native host library (g++ -O3 -shared).

Usage: python native/build.py  (writes native/libseedvr2_native.so)
The framework auto-builds on first use when g++ is available and falls back
to pure-numpy implementations otherwise."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "seedvr2_native.cpp")
OUT = os.path.join(HERE, "libseedvr2_native.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
