"""Exact GF(p) arithmetic on device (int32 balanced representation).

The workhorse is `modp_matmul`: an exact modular matrix product built from
int8 x int8 -> int32 MXU matmuls.  Balanced int32 values are decomposed into
D base-128 digits (each in [-64, 63], so any digit product is <= 4096 and
tens of thousands of them accumulate exactly in int32).  The D*D digit
products are computed as one batched MXU einsum and recombined with
per-digit-weight modular reduction in int64 (cheap O(n*m) work vs the
O(n*m*k) matmuls).

The prime is a *runtime* scalar: only the digit count D (and shapes) are
compile-time constants, so one compiled kernel serves every prime of a
given size tier.  D plays the role of the reference's float/double/i64
datatype choice (spasm_ffpack.cpp:130-139): D=2 up to ~2^13, D=3 up to
~2^20, D=5 for the full range p <= 2^32-5.

Overflow discipline (int64 lanes): every multiplication has *balanced*
operands (|x| <= p/2 < 2^31), so products stay below 2^62; sums of
products are reduced term-wise before accumulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_DIGIT_BITS = 7
_DIGIT_BASE = 1 << _DIGIT_BITS          # 128

# Max contraction depth per int8-matmul chunk so the digit convolution
# accumulates exactly in int32:  D * k * 64^2 < 2^31  =>  k < 2^19 / D.
_K_CHUNK = 1 << 16


class DeviceField(NamedTuple):
    """Per-prime constants; only `ndigits` is baked into compiled code."""
    p: int
    ndigits: int
    weights: np.ndarray      # (2*D - 1,) int64 balanced residues of 128^s


@functools.lru_cache(maxsize=64)
def device_field(p: int) -> DeviceField:
    # smallest d whose balanced base-128 digits reach +-p/2:
    # max representable = 63 * (128^d - 1) / 127.
    # Quantized to {2, 4, 5} so one compiled kernel serves a whole tier
    # (the analog of the reference's float/double/i64 datatype choice).
    d = 2
    while 63 * (_DIGIT_BASE ** d - 1) // (_DIGIT_BASE - 1) < p // 2:
        d += 1
    if d == 3:
        d = 4
    halfp = p // 2
    w = np.empty(2 * d - 1, dtype=np.int64)
    for s in range(2 * d - 1):
        r = pow(_DIGIT_BASE, s, p)
        w[s] = r - p if r > halfp else r
    return DeviceField(p, d, w)


def dnorm64(x, p, rounds: int = 2):
    """Balanced representative of x mod p, staying in int64.

    Exact multiply-based reduction — **no integer division**, which on TPU
    lowers to enormous code (slow to compile *and* run).  `rounds` passes
    of float32-reciprocal Barrett (error recurrence
    |r'| <= |r|*2^-23 + 0.51p) followed by two conditional corrections.

    Exactness bounds (corrections cover |r| <= p + p//2):
      rounds=2: any |x| <= p * 2^30 — every call site in this package
                (products of balanced operands are <= (p/2)^2 <= p*2^30;
                digit-matmul partials are <= 2^31 * p/2).
      rounds=1: |x| <= p * 2^22 — products of balanced operands when
                p <= 16255 (digit tier d == 2).
    p may be a traced int64 scalar or a Python int.
    """
    x = x.astype(jnp.int64)
    p64 = jnp.asarray(p, jnp.int64)
    invp = 1.0 / p64.astype(jnp.float32)
    for _ in range(rounds):
        q = jnp.rint(x.astype(jnp.float32) * invp).astype(jnp.int64)
        x = x - q * p64
    half = p64 // 2
    x = jnp.where(x > half, x - p64, x)
    x = jnp.where(x < -half, x + p64, x)
    return x


def dnorm(x, p, rounds: int = 2):
    """Balanced representative of x mod p (device; -> int32)."""
    return dnorm64(x, p, rounds).astype(jnp.int32)


def mulmod(a, b, p, rounds: int = 2):
    """Balanced product of balanced operands; exact for p <= 2^32-5."""
    return dnorm64(a.astype(jnp.int64) * b.astype(jnp.int64), p, rounds)


def modinv(a, p):
    """Balanced modular inverse via Fermat (a^(p-2) mod p), runtime p.

    Square-and-multiply over the 32 exponent bits with balanced
    intermediates (products stay < 2^62).  0 maps to 0.
    """
    a64 = dnorm64(a, p)

    def body(_, st):
        result, base, e = st
        result = jnp.where(e & 1 == 1, mulmod(result, base, p), result)
        base = mulmod(base, base, p)
        return result, base, e >> 1

    e0 = jnp.asarray(p - 2, dtype=jnp.int64)
    result, _, _ = jax.lax.fori_loop(0, 32, body, (jnp.int64(1), a64, e0))
    return jnp.where(a64 == 0, jnp.int64(0), result)


def _digits(x, d: int):
    """Decompose balanced int32 -> (d, ...) int8 digits, base 128, balanced.

    x = sum_s digits[s] * 128^s with digits in [-64, 63].
    """
    out = []
    v = x.astype(jnp.int64)       # int64: v +- 64 may overflow int32
    for _ in range(d):
        lo = ((v + 64) & (_DIGIT_BASE - 1)) - 64      # balanced digit
        out.append(lo.astype(jnp.int8))
        v = (v - lo) >> _DIGIT_BITS
    return jnp.stack(out)


def matmul_digits(A, B, p, weights, d: int):
    """Exact (A @ B) mod p; A, B balanced int32; p traced scalar;
    weights (2d-1,) int64; d static."""
    n, k = A.shape
    _, m = B.shape
    nchunks = -(-k // _K_CHUNK)
    acc = jnp.zeros((n, m), dtype=jnp.int64)
    for c in range(nchunks):
        lo = c * _K_CHUNK
        hi = min(k, lo + _K_CHUNK)
        Ad = _digits(A[:, lo:hi], d)                  # (d, n, kc) int8
        Bd = _digits(B[lo:hi, :], d)                  # (d, kc, m) int8
        # all d*d digit products in one batched MXU call
        P = jnp.einsum("ank,bkm->abnm", Ad, Bd,
                       preferred_element_type=jnp.int32)
        for s in range(2 * d - 1):
            part = jnp.zeros((n, m), dtype=jnp.int32)
            for d1 in range(d):
                d2 = s - d1
                if 0 <= d2 < d:
                    part = part + P[d1, d2]
            acc = acc + dnorm64(part.astype(jnp.int64) * weights[s], p)
        if (c + 1) % 64 == 0:                          # keep acc bounded
            acc = dnorm64(acc, p)
    return dnorm(acc, p)


@functools.partial(jax.jit, static_argnames=("d",))
def _matmul_jit(A, B, p, weights, d: int):
    return matmul_digits(A, B, p, weights, d)


def modp_matmul(A, B, p: int):
    """Exact (A @ B) mod p, balanced int32 in and out (host-facing)."""
    F = device_field(p)
    return _matmul_jit(jnp.asarray(A), jnp.asarray(B), jnp.int64(p),
                       jnp.asarray(F.weights), F.ndigits)


def modp_matmul_np(A: np.ndarray, B: np.ndarray, p: int) -> np.ndarray:
    """Host wrapper: numpy in/out."""
    A = np.ascontiguousarray(A, dtype=np.int32)
    B = np.ascontiguousarray(B, dtype=np.int32)
    return np.asarray(modp_matmul(A, B, p))
