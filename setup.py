"""Build hook for the native C++ IO kernel (csrc/fastio.cpp).

The library is a plain C-ABI shared object consumed via ctypes
(general_mcmc_tpu/io/native.py) — pybind11 is deliberately not used — so
the stock build_ext is subclassed to emit ``csrc/libgmtio.so`` instead of a
Python extension module.  Wheels and CI build it eagerly
(``python setup.py build_ext --inplace``); source installs without a
compiler still work because native.py falls back to a lazy g++ build and
then to pure pyarrow.
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_ext import build_ext


class BuildNativeIO(build_ext):
    def run(self):
        src = Path(__file__).parent / "csrc" / "fastio.cpp"
        out = src.with_name("libgmtio.so")
        cxx = self.compiler.compiler_cxx[0] if self.compiler else "g++"
        subprocess.run(
            [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(out)],
            check=True,
        )
        super().run()


setup(cmdclass={"build_ext": BuildNativeIO})
