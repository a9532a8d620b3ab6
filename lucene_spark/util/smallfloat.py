"""Norm quantization: positive ints -> 1 byte, 4 significant bits.

Reproduces the behavior of the reference's ``SmallFloat.intToByte4`` /
``byte4ToInt`` (reference: ``core/util/SmallFloat.java:103-168`` — a float-like
encoding for positive longs preserving order with 4 mantissa bits, with the
low ``NUM_FREE_VALUES`` byte values mapping exactly).  Implemented here from
the published semantics as vectorized numpy (no Java code reused): BM25 norms
must be byte4-quantized for rank/score identity with the reference
(``BM25Similarity.java:131-142`` stores ``intToByte4(fieldLength)`` as the
per-doc norm).

All functions are numpy-vectorized; scalars work too.
"""

from __future__ import annotations

import numpy as np

# longToInt4(2**31 - 1) == 231, so bytes 0..23 encode themselves exactly.
MAX_INT4 = 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24


def long_to_int4(i):
    """Order-preserving 4-significant-bit encoding of non-negative ints."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    # number of significant bits
    nbits = np.zeros_like(i)
    nz = i > 0
    # int64 values from token counts are < 2**62; frexp on float64 is exact
    # only below 2**53 — use bit_length via log-free loop on bytes instead.
    v = i.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (1 << shift)
        nbits = np.where(big, nbits + shift, nbits)
        v = np.where(big, v >> shift, v)
    nbits = np.where(nz, nbits + 1, 0)

    subnormal = nbits < 4
    shift = np.maximum(nbits - 4, 0)
    encoded = (i >> shift) & 0x07
    encoded = encoded | ((shift + 1) << 3)
    return np.where(subnormal, i, encoded).astype(np.int64)


def int4_to_long(i):
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    subnormal = shift == -1
    normal = (bits | 0x08) << np.maximum(shift, 0)
    return np.where(subnormal, bits, normal).astype(np.int64)


def int_to_byte4(i):
    """Encode a non-negative int to an unsigned byte value in [0, 255]."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    free = i < NUM_FREE_VALUES
    enc = NUM_FREE_VALUES + long_to_int4(np.where(free, 0, i - NUM_FREE_VALUES))
    return np.where(free, i, enc).astype(np.int64)


def byte4_to_int(b):
    """Decode an unsigned byte value in [0, 255] back to the quantized int."""
    b = np.asarray(b, dtype=np.int64)
    free = b < NUM_FREE_VALUES
    dec = NUM_FREE_VALUES + int4_to_long(np.where(free, 0, b - NUM_FREE_VALUES))
    return np.where(free, b, dec).astype(np.int64)


# 256-entry decoded length table (reference: BM25Similarity.LENGTH_TABLE)
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
