"""SHA-256 fingerprints and the deterministic counter-mode PRNG.

The reference derives all randomness used in certificates / randomized Schur
complements from SHA-256 in counter mode (/root/reference/src/spasm_prng.c).
The stream here is bit-for-bit identical (validated against the golden file
tests/Expected/prng of the reference): chunk t of the stream is

    SHA256( seed[32] || be32(prime) || be32(t) || be32(seq) )

interpreted as eight big-endian u32 words, followed by masked rejection
sampling into GF(p) and balanced normalization.

SHA-256 itself is the standard FIPS 180-4 function; we use hashlib, which is
bit-identical to the reference's OpenSSL-derived implementation
(/root/reference/src/sha256.c).
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

from .field import Field


def sha256_new():
    """A streaming SHA-256 context (update(bytes) / digest())."""
    return hashlib.sha256()


class PRNG:
    """SHA-256 counter-mode PRNG over GF(p), reference-bit-compatible.

    Mirrors spasm_prng_seed / spasm_prng_u32 / spasm_prng_ZZp
    (/root/reference/src/spasm_prng.c:21-74).
    """

    __slots__ = ("prime", "mask", "field", "_prefix", "_seq_bytes",
                 "_counter", "_words", "_i")

    def __init__(self, prime: int, seed: bytes, seq: int = 0):
        if len(seed) != 32:
            raise ValueError("seed must be 32 bytes")
        self.prime = prime
        mask = 1
        while mask < prime:
            mask <<= 1
        self.mask = mask - 1
        self.field = Field(prime)
        self._prefix = bytes(seed) + struct.pack(">I", prime & 0xFFFFFFFF)
        self._seq_bytes = struct.pack(">I", seq & 0xFFFFFFFF)
        self._counter = 0
        self._refill()

    @classmethod
    def from_u64(cls, prime: int, seed: int, seq: int = 0) -> "PRNG":
        """spasm_prng_seed_simple: the 32-byte seed is be32(lo) || be32(hi)
        of the u64 seed, zero-padded (/root/reference/src/spasm_prng.c:66-74).
        """
        block = struct.pack(">II", seed & 0xFFFFFFFF,
                            (seed >> 32) & 0xFFFFFFFF) + b"\x00" * 24
        return cls(prime, block, seq)

    def _refill(self):
        block = (self._prefix + struct.pack(">I", self._counter)
                 + self._seq_bytes)
        digest = hashlib.sha256(block).digest()
        self._words = struct.unpack(">8I", digest)
        self._counter += 1
        self._i = 0

    def u32(self) -> int:
        if self._i == 8:
            self._refill()
        w = self._words[self._i]
        self._i += 1
        return w

    def zzp(self) -> int:
        """Uniform balanced element of GF(p) by rejection sampling."""
        while True:
            x = self.u32() & self.mask
            if x < self.prime:
                return self.field.normalize(x)

    def u32_array(self, count: int) -> np.ndarray:
        """Next `count` stream words, bit-identical to `count` u32()
        calls (hashlib-batched: ~9M words/s vs ~0.5M scalar)."""
        out = np.empty(count, np.uint32)
        k = 0
        while k < count and self._i < 8:
            out[k] = self._words[self._i]
            self._i += 1
            k += 1
        if k < count:
            nblk = (count - k + 7) // 8
            pre, seq = self._prefix, self._seq_bytes
            c0 = self._counter
            digests = b"".join(
                hashlib.sha256(pre + struct.pack(">I", (c0 + t)
                                                 & 0xFFFFFFFF)
                               + seq).digest()
                for t in range(nblk))
            self._counter += nblk
            words = np.frombuffer(digests, dtype=">u4")
            take = count - k
            out[k:] = words[:take]
            self._words = tuple(int(w) for w in words[-8:])
            self._i = 8 - (words.size - take)
        return out

    def _rejection_array(self, count: int, bound: int, mask: int,
                         balanced: bool) -> np.ndarray:
        """count accepted draws; consumes the stream exactly like the
        scalar loop (the accepted subsequence of masked words)."""
        out = np.empty(count, np.int64)
        k = 0
        while k < count:
            xs = self.u32_array(count - k).astype(np.int64) & mask
            acc = xs[xs < bound]
            out[k:k + acc.size] = acc
            k += acc.size
        if balanced:
            out = self.field.narray(out)
        return out

    def zzp_array(self, count: int) -> np.ndarray:
        return self._rejection_array(count, self.prime, self.mask,
                                     True).astype(np.int32)

    def uniform(self, bound: int) -> int:
        """Uniform integer in [0, bound) by masked rejection sampling
        (same scheme spasm_prng_ZZp uses for GF(p) elements)."""
        mask = 1
        while mask < bound:
            mask <<= 1
        mask -= 1
        while True:
            x = self.u32() & mask
            if x < bound:
                return x

    def uniform_array(self, count: int, bound: int) -> np.ndarray:
        mask = 1
        while mask < bound:
            mask <<= 1
        return self._rejection_array(count, bound, mask - 1, False)
