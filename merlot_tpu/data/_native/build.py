"""Build the native data-path extension: python -m merlot_tpu.data._native.build"""

from __future__ import annotations

import os
import subprocess
import sysconfig


def _have_libjpeg() -> bool:
    for inc in ("/usr/include/jpeglib.h",
                "/usr/include/x86_64-linux-gnu/jpeglib.h"):
        if os.path.exists(inc):
            return True
    return False


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native.cc")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, f"_merlot_native{suffix}")
    include = sysconfig.get_paths()["include"]
    # -ffp-contract=off: the resize kernel must be bit-identical to the
    # numpy bilinear reference; FMA contraction would change the rounding
    cmd = ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
           "-std=c++17", f"-I{include}", src, "-o", out]
    if _have_libjpeg():  # native JPEG decode (optional, like the TF C++ op)
        cmd.insert(cmd.index(src), "-DMERLOT_HAVE_JPEG")
        cmd += ["-ljpeg"]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print("built:", build())
