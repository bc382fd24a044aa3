"""native (C++) host-side kernels, built on demand with g++ and loaded via
ctypes -- the role the reference's torch cpp_extension JIT build plays for
its CUDA ops (reference models/roipool/roipool.py:12-19), applied here to
the host-side hot loops (Viterbi tubelet linking)."""

from . import viterbi_native
