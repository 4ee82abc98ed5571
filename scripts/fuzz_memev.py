"""Fuzz harness for libmemev's untrusted-input parsers.

The native loaders (mem_tpu/native/memev.cpp) parse dataset bytes that come
from disk — npy headers, ZIP central directories, raw AER records. This
harness drives EVERY C entry point over a corpus of corrupt/truncated/random
files and asserts the process survives; run it against an ASAN+UBSan build
(tests/test_native_fuzz.py does) so an out-of-bounds access or UB cast
aborts instead of silently reading garbage.

Usage: python scripts/fuzz_memev.py <libmemev.so> <corpus_dir>

Exit 0 + "FUZZ-OK" on survival. Any sanitizer report aborts the process
(-fno-sanitize-recover), which the caller sees as a nonzero exit.

Intentionally numpy+ctypes only (no mem_tpu import): the bindings layer is
not under test here, the C ABI is, and the ASAN .so is a separate build
from the one mem_tpu.native would load.
"""
import ctypes
import os
import sys

import numpy as np


def bind(path):
    lib = ctypes.CDLL(path)
    c = ctypes
    lib.memev_decode_atis.restype = c.c_int64
    lib.memev_decode_atis.argtypes = [c.c_char_p, c.c_int64,
                                      c.POINTER(c.c_double)]
    lib.memev_decode_ncars.restype = c.c_int64
    lib.memev_decode_ncars.argtypes = [c.c_char_p, c.c_int64,
                                       c.POINTER(c.c_double)]
    lib.memev_load_batch.restype = c.c_int64
    lib.memev_load_batch.argtypes = [
        c.POINTER(c.c_char_p), c.POINTER(c.c_double), c.c_int64, c.c_int64,
        c.c_int64, c.POINTER(c.c_float), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32)]
    lib.memev_load_batch_xyp.restype = c.c_int64
    lib.memev_load_batch_xyp.argtypes = [
        c.POINTER(c.c_char_p), c.POINTER(c.c_double), c.c_int64, c.c_int64,
        c.c_int64, c.POINTER(c.c_int16), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32)]
    lib.memev_load_batch_dsec.restype = c.c_int64
    lib.memev_load_batch_dsec.argtypes = [
        c.POINTER(c.c_char_p), c.POINTER(c.c_double), c.c_int64, c.c_int64,
        c.c_int64, c.c_int64, c.POINTER(c.c_int16), c.POINTER(c.c_int32)]
    lib.memev_load_batch_imgnet.restype = c.c_int64
    lib.memev_load_batch_imgnet.argtypes = [
        c.POINTER(c.c_char_p), c.POINTER(c.c_double), c.c_int64, c.c_int64,
        c.c_double, c.c_double, c.c_int64, c.POINTER(c.c_float),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32)]
    return lib


def drive_file(lib, path):
    c = ctypes
    c_paths = (c.c_char_p * 1)(path.encode())
    for frac in (0.0, 0.5, 1.0):
        c_frac = (c.c_double * 1)(frac)
        for cap in (1, 64):
            ev4 = np.empty((1, cap, 4), np.float32)
            ev3 = np.empty((1, cap, 3), np.int16)
            nv = np.zeros((1,), np.int32)
            mx = np.zeros((1, 2), np.int32)
            f32p = ev4.ctypes.data_as(c.POINTER(c.c_float))
            i16p = ev3.ctypes.data_as(c.POINTER(c.c_int16))
            nvp = nv.ctypes.data_as(c.POINTER(c.c_int32))
            mxp = mx.ctypes.data_as(c.POINTER(c.c_int32))
            lib.memev_load_batch(c_paths, c_frac, 1, cap, 1, f32p, nvp, mxp)
            lib.memev_load_batch_xyp(c_paths, c_frac, 1, cap, 1, i16p, nvp,
                                     mxp)
            for seg_h in (440, 1):
                lib.memev_load_batch_dsec(c_paths, c_frac, 1, cap, seg_h, 1,
                                          i16p, nvp)
            lib.memev_load_batch_imgnet(c_paths, c_frac, 1, cap, 256.0 / 480,
                                        256.0 / 480, 1, f32p, nvp, mxp)
    # raw decoders on the file bytes
    with open(path, "rb") as f:
        buf = f.read()
    out = np.empty((max(len(buf) // 5, 1), 4), np.float64)
    lib.memev_decode_atis(buf, len(buf),
                          out.ctypes.data_as(c.POINTER(c.c_double)))
    out = np.empty((max(len(buf) // 8, 1), 4), np.float64)
    lib.memev_decode_ncars(buf, len(buf),
                           out.ctypes.data_as(c.POINTER(c.c_double)))


def main():
    so, corpus = sys.argv[1], sys.argv[2]
    lib = bind(so)
    files = sorted(os.listdir(corpus))
    for name in files:
        drive_file(lib, os.path.join(corpus, name))
    print(f"FUZZ-OK n={len(files)}")


if __name__ == "__main__":
    main()
