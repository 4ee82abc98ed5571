"""Decoder byte-tests against hand-crafted binary strings."""
import numpy as np

from mem_tpu.events.decoders import (
    decode_atis_bytes,
    decode_ncars_bytes,
    encode_atis_bytes,
    encode_ncars_bytes,
)


def _reference_atis_decode(buf: bytes) -> np.ndarray:
    """Straight transliteration of the reference's per-event byte loop
    (process_data/process_dataset.py:48-60), used only as a test oracle."""
    events = []
    for i in range(0, len(buf) - len(buf) % 5, 5):
        data = buf[i : i + 5]
        y = data[0]
        x = data[1]
        p = (data[2] >> 7) & 0x01
        t = (data[2] & 0x7F).to_bytes(1, "big") + data[3:5]
        t = int.from_bytes(t, "big")
        events.append([float(y), float(x), float(t), 2.0 * p - 1.0])
    return np.array(events, dtype=np.float64)


def test_atis_handcrafted():
    # one event: y=3, x=7, p=1, t=0x123456 & 0x7fffff
    buf = bytes([3, 7, 0x80 | 0x12, 0x34, 0x56])
    ev = decode_atis_bytes(buf)
    assert ev.shape == (1, 4)
    assert ev[0, 0] == 3 and ev[0, 1] == 7
    assert ev[0, 2] == 0x123456
    assert ev[0, 3] == 1.0

    buf = bytes([255, 0, 0x7F, 0xFF, 0xFF])  # p=0, max timestamp
    ev = decode_atis_bytes(buf)
    assert ev[0, 2] == 0x7FFFFF
    assert ev[0, 3] == -1.0


def test_atis_random_roundtrip(rng):
    n = 1000
    buf = rng.integers(0, 256, size=5 * n, dtype=np.uint8).tobytes()
    got = decode_atis_bytes(buf)
    want = _reference_atis_decode(buf)
    np.testing.assert_array_equal(got, want)


def test_atis_encode_roundtrip(rng):
    ev = np.stack(
        [
            rng.integers(0, 240, 500),
            rng.integers(0, 256, 500),  # ATIS x/y fields are 1 byte each
            np.sort(rng.integers(0, 2**23, 500)),
            rng.choice([-1.0, 1.0], 500),
        ],
        axis=1,
    ).astype(np.float64)
    np.testing.assert_array_equal(decode_atis_bytes(encode_atis_bytes(ev)), ev)


def test_ncars_handcrafted():
    # y=5 (bits 0-13), x=9 (bits 14-27), p=1 (bit 28), t=1000
    word = 5 | (9 << 14) | (1 << 28)
    body = np.array([(1000, word)], dtype="<u4,<u4").view("<u4").tobytes()
    buf = b"% header line\n% another\n" + b"\x00\x00" + body
    ev = decode_ncars_bytes(buf)
    assert ev.shape == (1, 4)
    assert list(ev[0]) == [5.0, 9.0, 1000.0, 1.0]


def test_ncars_encode_roundtrip(rng):
    ev = np.stack(
        [
            rng.integers(0, 100, 300),
            rng.integers(0, 120, 300),
            np.sort(rng.integers(0, 10**6, 300)),
            rng.integers(0, 2, 300),
        ],
        axis=1,
    ).astype(np.float64)
    np.testing.assert_array_equal(decode_ncars_bytes(encode_ncars_bytes(ev)), ev)


def test_ncars_polarity_stays_01(rng):
    ev = np.zeros((4, 4))
    ev[:, 3] = [0, 1, 0, 1]
    got = decode_ncars_bytes(encode_ncars_bytes(ev))
    assert set(np.unique(got[:, 3])) <= {0.0, 1.0}
