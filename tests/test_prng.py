"""PRNG / SHA-256 golden tests.

The PRNG stream must reproduce the reference's tests/Expected/prng file
bit-for-bit: it is the cross-implementation compatibility anchor for rank
certificates and every randomized path.
"""
import hashlib

from spasm_tpu.hashing import PRNG


def _line(prime, seed, seq):
    g = PRNG.from_u64(prime, seed, seq)
    vals = ", ".join(f"{g.zzp():6d}" for _ in range(10))
    return f"prime={prime}, seed={seed:016x}, seq={seq:08x}, out={vals}"


def test_prng_golden(expected_dir):
    lines = [
        _line(257, 0, 0),
        _line(257, 0, 1),
        _line(257, 1, 0),
        _line(257, 1, 1),
        _line(65537, 0xDEAD00000000BEEF, 0),
    ]
    golden = (expected_dir / "prng").read_text().splitlines()
    assert lines == golden


def test_sha_golden(expected_dir):
    msgs = [b"", b"X", b"Hello World",
            b"abcdefghijklmnopqrstuvwxyz0123456789"
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZ+-*/="]
    got = [hashlib.sha256(m).hexdigest() for m in msgs]
    golden = (expected_dir / "hash").read_text().splitlines()
    assert got == golden


def test_prng_balanced_range():
    g = PRNG.from_u64(4294967291, 42, 3)
    for _ in range(1000):
        v = g.zzp()
        assert -4294967291 // 2 <= v <= 4294967291 // 2
