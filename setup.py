"""Build hook for the native C++ IO kernel (csrc/fastio.cpp).

The library is a plain C-ABI shared object consumed via ctypes
(general_mcmc_tpu/io/native.py) — pybind11 is deliberately not used — so
the stock build_ext is subclassed to emit ``general_mcmc_tpu/io/libgmtio.so``
inside the package (so wheels actually ship it).  ``has_ext_modules`` is
forced true so ``python -m build --wheel`` runs build_ext and tags the
wheel as platform-specific.  Source installs without a compiler still
work: native.py falls back to a lazy g++ build and then to pure pyarrow.
"""

import os
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.dist import Distribution

_PKG_SO = Path("general_mcmc_tpu") / "io" / "libgmtio.so"


class BuildNativeIO(build_ext):
    def run(self):
        root = Path(__file__).parent
        src = root / "csrc" / "fastio.cpp"
        if not src.exists():
            # sdists without csrc/ and bare checkouts: pure-Python install;
            # io/native.py falls back to a lazy build or pyarrow at runtime.
            print("csrc/fastio.cpp not found; skipping native IO kernel")
            return
        # --inplace: write into the source tree; wheel builds: into build_lib
        dest_root = root if self.inplace else Path(self.build_lib)
        out = dest_root / _PKG_SO
        out.parent.mkdir(parents=True, exist_ok=True)
        cxx = os.environ.get("CXX", "g++")
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", str(src),
                 "-o", str(out)],
                check=True,
            )
        except (OSError, subprocess.CalledProcessError) as e:
            # No compiler (source installs on minimal images): install
            # proceeds pure-Python, matching the documented fallback chain.
            print(f"native IO kernel build skipped ({e}); pyarrow fallback applies")


class BinaryDistribution(Distribution):
    def has_ext_modules(self):
        return True


setup(cmdclass={"build_ext": BuildNativeIO}, distclass=BinaryDistribution)
