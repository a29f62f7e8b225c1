"""Build script: packages the framework and compiles the native I/O library.

The reference builds three CPython extension modules
(/root/reference/setup.py:51-55); here the native surface is one ctypes
shared library (fastqdedup_tpu/native/_fastq_io.c — FASTQ chunk parser +
deterministic gzip writer).  It is not a Python extension module (no
CPython ABI), so a plain ``cc -shared`` replaces Extension()/build_ext; an
install without a C toolchain still works because the loader rebuilds on
demand and the pure-Python I/O path is a functional fallback.
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        try:
            sys.path.insert(0, ".")
            from fastqdedup_tpu.native.build import library_path
            lib = library_path()
            self.copy_file(
                lib, f"{self.build_lib}/fastqdedup_tpu/native/_fastq_io.so")
        except (ImportError, subprocess.CalledProcessError) as exc:
            print(f"warning: native library not built ({exc}); "
                  "pure-Python I/O fallback will be used", file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
