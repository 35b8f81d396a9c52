"""GF(p) arithmetic property tests (port of /root/reference/tests/GFp.c)."""
import numpy as np
import pytest

from spasm_tpu.field import Field
from spasm_tpu.hashing import PRNG


@pytest.mark.parametrize("p", [2, 3, 257, 65537])
def test_inverse_exhaustive(p):
    F = Field(p)
    xs = F.narray(np.arange(1, p))
    ys = F.inverse_array(xs)
    prods = F.mul(xs, ys)
    assert np.all(prods == 1)
    assert np.all(ys <= p // 2)
    assert np.all(ys >= -(p // 2))


@pytest.mark.parametrize("p", [
    67108859,          # largest 26-bit prime
    189812507,         # reference float/double boundary
    0x7FFFFFFF,        # largest 31-bit prime
    3037000493,        # largest p with a*x+y in 63 bits
    0xFFFFFFFB,        # largest 32-bit prime (upper limit)
])
def test_inverse_randomized(p):
    F = Field(p)
    gen = PRNG.from_u64(p, 0, 0)
    xs = gen.zzp_array(2000)
    xs = xs[xs != 0]
    ys = F.inverse_array(xs)
    assert np.all(F.mul(xs, ys) == 1)
    assert np.all(np.abs(ys.astype(np.int64)) <= p // 2)


@pytest.mark.parametrize("p", [3, 257, 65537, 189812507, 0xFFFFFFFB])
def test_axpy_roundtrip(p):
    F = Field(p)
    gen = PRNG.from_u64(p, 7, 0)
    x = gen.zzp_array(1000).astype(np.int64)
    y = gen.zzp_array(1000).astype(np.int64)
    z = gen.zzp_array(1000).astype(np.int64)
    zz = F.axpy(x, y, z)
    back = F.axpy(-x, y, zz)
    assert np.all(back == z)


def test_balanced_range_and_scalar_ops():
    F = Field(257)
    assert F.normalize(256) == -1
    assert F.normalize(-129) == 128
    assert F.normalize(128) == 128
    assert F.normalize(129) == -128
    assert F.inverse(2) == F.normalize(pow(2, -1, 257))
    assert F.mul(16, 16) == F.normalize(256)
