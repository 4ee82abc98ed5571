"""Memory-safety fuzz of libmemev's untrusted-input parsers under ASAN+UBSan.

The native loaders parse bytes straight off disk (npy headers, ZIP central
directories, raw AER records). A dataset with one truncated or corrupt file
must produce a clean per-item failure (rc = 1-based index -> IOError in the
bindings), never an out-of-bounds access. This builds a sanitizer
instrumented copy of memev.cpp, generates a deterministic corpus of
truncations / header mutations / bit flips / random blobs around every
format the library accepts, and drives every C entry point over it in a
subprocess (scripts/fuzz_memev.py); -fno-sanitize-recover turns any OOB or
UB cast into a nonzero exit.

Regressions covered: header rows-vs-payload validation (a truncated f8 npy
claimed N rows the buffer didn't hold -> OOB read; a negative N made the
zero-pad loop start at a negative index -> OOB WRITE), ZIP central-directory
name reads past EOF, and float->int UB casts on corrupt payload values.
"""
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from mem_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++/libmemev")

_SRC = os.path.join(os.path.dirname(native.__file__), "memev.cpp")
_ASAN_SO = "/tmp/libmemev_asan.so"


def _build_asan_so():
    if (os.path.exists(_ASAN_SO)
            and os.path.getmtime(_ASAN_SO) >= os.path.getmtime(_SRC)):
        return _ASAN_SO
    r = subprocess.run(
        ["g++", "-g", "-O1", "-std=c++17", "-shared", "-fPIC", "-pthread",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
         _SRC, "-o", _ASAN_SO],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"no sanitizer toolchain: {r.stderr[:200]}")
    return _ASAN_SO


def _corpus(root, rng):
    os.makedirs(root, exist_ok=True)
    idx = [0]

    def emit(data: bytes):
        with open(os.path.join(root, f"{idx[0]:04d}.bin"), "wb") as f:
            f.write(data)
        idx[0] += 1

    # --- valid seeds -------------------------------------------------------
    def npy_bytes(arr):
        import io
        b = io.BytesIO()
        np.save(b, arr)
        return b.getvalue()

    ev8 = npy_bytes((rng.random((100, 4)) * 400).astype(np.float64))
    ev4 = npy_bytes((rng.random((37, 4)) * 400).astype(np.float32))

    import io
    zb = io.BytesIO()
    n = 200
    np.savez(zb, x=rng.integers(0, 640, n).astype(np.uint16),
             y=rng.integers(0, 480, n).astype(np.uint16),
             t=np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
             p=rng.integers(0, 2, n).astype(np.uint8))
    npz = zb.getvalue()

    seeds = [ev8, ev4, npz]
    for s in seeds:
        emit(s)

    # --- truncations: every seed cut at header-region and payload offsets --
    for s in seeds:
        cuts = {1, 5, 6, 8, 9, 10, 11, 60, 79, 80, 81, len(s) // 2,
                len(s) - 21, len(s) - 1}
        for c in sorted(c for c in cuts if 0 < c < len(s)):
            emit(s[:c])

    # --- structured npy header mutations ------------------------------------
    for bad in [b"(99999999999999, 4)", b"(-5, 4)", b"(100, 4",
                b"(1000000, 4)", b"(100,)", b"(100, 3)"]:
        emit(ev8.replace(b"(100, 4)", bad))
    emit(ev8.replace(b"<f8", b">f8"))
    emit(ev8.replace(b"False", b"True "))          # fortran_order
    v2 = bytearray(ev8)
    v2[6] = 2                                      # claim v2 w/ v1 header
    emit(bytes(v2))
    emit(b"\x93NUMPY" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)))

    # --- npz structural mutations -------------------------------------------
    # member count lies, bad central-dir offset, compressed members,
    # missing / length-mismatched columns
    zb = io.BytesIO()
    np.savez_compressed(zb, x=np.zeros(5, np.uint16), y=np.zeros(5, np.uint16),
                        t=np.zeros(5, np.int64), p=np.zeros(5, np.uint8))
    emit(zb.getvalue())
    zb = io.BytesIO()
    np.savez(zb, x=np.zeros(5, np.uint16), y=np.zeros(7, np.uint16),
             t=np.zeros(5, np.int64), p=np.zeros(5, np.uint8))
    emit(zb.getvalue())
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w", zipfile.ZIP_STORED) as z:
        z.writestr("x.npy", b"\x93NUMPY" + b"\x01\x00" + b"\xff\xff" + b"A")
        z.writestr("y.npy", b"junk")
        z.writestr("t.npy", b"")
        z.writestr("p.npy", b"\x93NUMPY")
    emit(zb.getvalue())

    # --- random bit flips over every region of the valid files -------------
    for s in (ev8, npz):
        for _ in range(40):
            m = bytearray(s)
            for _ in range(int(rng.integers(1, 8))):
                m[int(rng.integers(0, len(m)))] ^= int(
                    1 << rng.integers(0, 8))
            emit(bytes(m))

    # --- pure noise ----------------------------------------------------------
    for ln in (0, 1, 4, 9, 21, 22, 97, 1024):
        emit(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    # ncars-shaped: header lines without terminators / EOF inside header
    emit(b"%" * 300)
    emit(b"% header\n% more")
    emit(b"% h\n\xff\xfe" + bytes(rng.integers(0, 256, 33, dtype=np.uint8)))
    return idx[0]


def test_fuzz_parsers_under_asan(tmp_path):
    so = _build_asan_so()
    rng = np.random.default_rng(1234)
    corpus = str(tmp_path / "corpus")
    n = _corpus(corpus, rng)
    assert n > 120
    env = dict(os.environ)
    env["LD_PRELOAD"] = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True,
        text=True).stdout.strip()
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    harness = os.path.join(os.path.dirname(__file__), "..", "scripts",
                           "fuzz_memev.py")
    r = subprocess.run([sys.executable, harness, so, corpus],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, f"sanitizer hit:\n{r.stdout[-800:]}\n{r.stderr[-2000:]}"
    assert f"FUZZ-OK n={n}" in r.stdout


def test_corrupt_file_fails_per_item_not_batch(tmp_path, rng):
    """A truncated npy in a batch surfaces as IOError naming THAT path after
    the bounds fix (the old parser accepted the header and read OOB)."""
    good = (rng.random((50, 4)) * 100).astype(np.float32)
    gp = tmp_path / "good.npy"
    np.save(gp, good)
    raw = (tmp_path / "good.npy").read_bytes()
    bp = tmp_path / "trunc.npy"
    bp.write_bytes(raw[: len(raw) - 40 * 16])     # header claims 50 rows
    with pytest.raises(IOError, match="trunc.npy"):
        native.load_batch([str(gp), str(bp)], [0.0, 0.0], cap=64,
                          num_threads=1)
    ev, nv, mx = native.load_batch([str(gp)], [0.0], cap=64, num_threads=1)
    assert nv[0] == 50
    np.testing.assert_array_equal(ev[0, :50], good)
