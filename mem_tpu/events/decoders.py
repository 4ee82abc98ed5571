"""Raw event-camera format decoders (L0).

Decodes binary AER recordings into ``(N, 4)`` float64 arrays of events.
Column conventions follow the reference datasets exactly (including the
reference's column-order quirk where N-Caltech101/N-Cars store ``[y, x, t, p]``
— downstream transforms treat column 0 as "x", so those datasets' histograms
are effectively transposed relative to sensor axes; this is consistent between
train and eval and must be preserved for parity):

  - N-Caltech101 (ATIS .bin): ``[y, x, t, p]`` with p in {-1.0, +1.0}
    (reference: process_data/process_dataset.py:24-63)
  - N-Cars (.dat): ``[y, x, t, p]`` with p in {0.0, 1.0}
    (reference: process_data/process_dataset.py:66-105)
  - N-ImageNet (.npz): ``[x, y, t, p]`` with p in {-1, +1} after loader mapping
    (reference: process_data/process_dataset.py:108-117 +
     mem/dataset_folder.py:285-292)

Unlike the reference's pure-Python 5-byte loop (the L0 hot spot), decoding here
is fully vectorized numpy over the whole file buffer (~100x faster); an
optional C++ backend accelerates batch decode further (mem_tpu.native).
"""
from __future__ import annotations

import os
import struct

import numpy as np


def decode_atis_bytes(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode the ATIS 5-byte-per-event binary format (N-Caltech101).

    Layout per event (reference process_data/process_dataset.py:48-60):
      byte0 = y, byte1 = x, byte2 bit7 = polarity,
      (byte2 & 0x7f, byte3, byte4) = 23-bit big-endian timestamp.

    Returns ``(N, 4)`` float64 ``[y, x, t, p]`` with p mapped to ``2p - 1``.
    """
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    n = raw.size // 5
    raw = raw[: n * 5].reshape(n, 5).astype(np.int64)
    y = raw[:, 0]
    x = raw[:, 1]
    p = (raw[:, 2] >> 7) & 0x01
    t = ((raw[:, 2] & 0x7F) << 16) | (raw[:, 3] << 8) | raw[:, 4]
    out = np.empty((n, 4), dtype=np.float64)
    out[:, 0] = y
    out[:, 1] = x
    out[:, 2] = t
    out[:, 3] = 2.0 * p - 1.0
    return out


def _skip_ncars_header(raw: np.ndarray) -> int:
    """Return the offset just past the '%'-prefixed ASCII header + 2 bytes.

    Mirrors reference process_dataset.py:81-88: readline(256) while the first
    byte of the line is '%' (0x25), then skip 2 extra bytes.
    """
    off = 0
    while off < raw.size and raw[off] == 0x25:  # '%'
        # find end of line (readline semantics: up to and including '\n',
        # capped at 256 bytes)
        nl = np.flatnonzero(raw[off : off + 256] == 0x0A)
        if nl.size == 0:
            off += min(256, raw.size - off)
        else:
            off += int(nl[0]) + 1
    return off + 2


def decode_ncars_bytes(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode the N-Cars .dat format.

    Header: ASCII lines starting with '%', then 2 bytes to skip. Records are
    8 bytes: uint32 LE timestamp + uint32 LE packed word with y = bits 0-13,
    x = bits 14-27, p = bit 28 (reference process_dataset.py:90-103).

    Returns ``(N, 4)`` float64 ``[y, x, t, p]`` with p in {0.0, 1.0}
    (the reference keeps {0,1} polarity for N-Cars — preserved, since the
    rasterizer's ``p == -1`` negative plane is then always empty for N-Cars).
    """
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    off = _skip_ncars_header(raw)
    body = raw[off:]
    n = body.size // 8
    words = body[: n * 8].view("<u4").reshape(n, 2).astype(np.int64)
    t = words[:, 0]
    data = words[:, 1]
    y = data & 0x00003FFF
    x = (data & 0x0FFFC000) >> 14
    p = (data & 0x10000000) >> 28
    out = np.empty((n, 4), dtype=np.float64)
    out[:, 0] = y
    out[:, 1] = x
    out[:, 2] = t
    out[:, 3] = p
    return out


def decode_ncaltech101_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        buf = f.read()
    from mem_tpu import native

    out = native.decode_atis(buf) if native.available() else None
    return out if out is not None else decode_atis_bytes(buf)


def decode_ncars_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        buf = f.read()
    from mem_tpu import native

    out = native.decode_ncars(buf) if native.available() else None
    return out if out is not None else decode_ncars_bytes(buf)


def decode_nimagenet_file(path: str) -> np.ndarray:
    """Repack an N-ImageNet .npz ``event_data`` structured array to (N, 4).

    Stored order is the structured array's fields; the *loader*
    (mem_tpu.data.folder.imgnet_npy_loader) is what maps p -> {-1,+1}.
    Reference: process_dataset.py:108-117 keeps the raw structured array.
    """
    return np.load(path)["event_data"]


def encode_atis_bytes(events: np.ndarray) -> bytes:
    """Inverse of :func:`decode_atis_bytes` (testing utility).

    ``events`` is ``(N, 4)`` ``[y, x, t, p]`` with p in {-1, +1}.
    """
    ev = np.asarray(events)
    n = ev.shape[0]
    raw = np.empty((n, 5), dtype=np.uint8)
    y = ev[:, 0].astype(np.int64)
    x = ev[:, 1].astype(np.int64)
    t = ev[:, 2].astype(np.int64)
    p = ((ev[:, 3] + 1) / 2).astype(np.int64)
    raw[:, 0] = y
    raw[:, 1] = x
    raw[:, 2] = ((p & 1) << 7) | ((t >> 16) & 0x7F)
    raw[:, 3] = (t >> 8) & 0xFF
    raw[:, 4] = t & 0xFF
    return raw.tobytes()


def encode_ncars_bytes(events: np.ndarray, header: bytes = b"% ncars\n") -> bytes:
    """Inverse of :func:`decode_ncars_bytes` (testing utility)."""
    ev = np.asarray(events)
    n = ev.shape[0]
    t = ev[:, 2].astype(np.uint32)
    word = (
        (ev[:, 0].astype(np.uint32) & 0x3FFF)
        | ((ev[:, 1].astype(np.uint32) & 0x3FFF) << 14)
        | ((ev[:, 3].astype(np.uint32) & 0x1) << 28)
    )
    body = np.empty((n, 2), dtype="<u4")
    body[:, 0] = t
    body[:, 1] = word
    return header + b"\x00\x00" + body.tobytes()
