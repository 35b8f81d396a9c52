"""GF(p) arithmetic in the balanced representation.

Elements of GF(p) (p an odd prime, 2 <= p <= 2^32 - 5) are stored as int32
in the *balanced* range [-(p-1)/2, (p-1)/2].  This mirrors the reference
exactly (/root/reference/src/spasm_ZZp.c:5-24) so that values written to SMS
files, certificates and PRNG streams agree bit-for-bit.

Host-side code here uses numpy int64 intermediates (products stay < 2^63 for
p < 2^32).  Device-side arithmetic lives in spasm_tpu.dense.modp.
"""
from __future__ import annotations

import dataclasses

import numpy as np

MAX_PRIME = 0xFFFFFFFB  # largest prime <= 2^32 - 5 (spasm_ZZp.c:11)


@dataclasses.dataclass(frozen=True)
class Field:
    """The field GF(p) with balanced element representation."""
    p: int

    def __post_init__(self):
        if self.p >= 0:
            if not (2 <= self.p <= MAX_PRIME):
                raise ValueError(f"unsupported modulus {self.p}")

    @property
    def halfp(self) -> int:
        return self.p // 2

    @property
    def mhalfp(self) -> int:
        return self.p // 2 - self.p + 1

    # ---- scalar ops (exact Python ints) ----------------------------------

    def normalize(self, x):
        """Map any integer(s) to the balanced representative of x mod p."""
        if np.isscalar(x) or isinstance(x, (int, np.integer)):
            r = int(x) % self.p
            return r - self.p if r > self.halfp else r
        return self.narray(x)

    def narray(self, x) -> np.ndarray:
        """Vectorized normalize -> int32 ndarray.

        Accepts int64 arrays or object arrays of arbitrary Python ints
        (used by tests / oracles with products beyond 2^63).
        """
        x = np.asarray(x)
        if x.dtype == object:
            r = (x % self.p).astype(np.int64) if x.size else \
                np.zeros(x.shape, np.int64)
        else:
            r = x.astype(np.int64) % self.p
        r = np.where(r > self.halfp, r - self.p, r)
        return r.astype(np.int32)

    def add(self, a, b):
        return self.narray(np.asarray(a, np.int64) + np.asarray(b, np.int64))

    def sub(self, a, b):
        return self.narray(np.asarray(a, np.int64) - np.asarray(b, np.int64))

    def mul(self, a, b):
        return self.narray(np.asarray(a, np.int64) * np.asarray(b, np.int64))

    def axpy(self, a, x, y):
        """a*x + y elementwise (all balanced int32); exact in int64."""
        return self.narray(
            np.asarray(a, np.int64) * np.asarray(x, np.int64)
            + np.asarray(y, np.int64))

    def inverse(self, a):
        """Balanced modular inverse (scalar)."""
        aa = int(a) % self.p
        if aa == 0:
            raise ZeroDivisionError(f"0 has no inverse mod {self.p}")
        return self.normalize(pow(aa, -1, self.p))

    def inverse_array(self, a) -> np.ndarray:
        """Vectorized balanced inverse via Fermat (p prime). 0 maps to 0."""
        a = np.asarray(a, dtype=np.int64) % self.p
        if self.p < (1 << 31):
            # products stay below 2^62: exact in int64
            e = self.p - 2
            result = np.ones_like(a)
            base = a.copy()
            while e:
                if e & 1:
                    result = (result * base) % self.p
                base = (base * base) % self.p
                e >>= 1
            return self.narray(result)
        flat = a.ravel()
        out = np.fromiter(
            (pow(int(v), -1, self.p) if v else 0 for v in flat),
            dtype=np.int64, count=flat.size)
        return self.narray(out.reshape(a.shape))
