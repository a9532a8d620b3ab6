"""MinHashFilter: min-hash fingerprint tokens from a (shingled) token
stream — a faithful transliteration of
``analysis/common/.../minhash/MinHashFilter.java`` (the Solr/Lucene
MinHash fingerprinting layout; typical input is 5-word shingles, e.g.
``Analyzer(shingle_size=5, fixed_shingles=True)``).

Algorithm (MinHashFilter.java:146-247):

* every token is hashed with MurmurHash3 x64 128 over its UTF-16LE bytes
  (murmurhash3_x64_128, :412-505 — the huge fall-through switch);
* for each of ``hash_count`` hash variants, the token hash is combined
  with the cached murmur of the variant index (``combineOrdered``:
  ``v*37 + h`` per 64-bit half, :345-353);
* the combined hash lands in bucket ``(val2 >>> 32) / bucket_size`` and a
  per-(variant, bucket) FixedSizeTreeSet keeps the ``hash_set_size``
  smallest values under UNSIGNED (val2, val1) order (:355-380);
* with rotation (the factory default when bucket_count > 1,
  MinHashFilterFactory.java:66) and set size 1, empty buckets borrow the
  min of the next non-empty bucket, scanning forward cyclically
  (:183-201) — every bucket then emits exactly one token;
* emission: variants in order, buckets in order, set values ascending;
  the token text packs the hash as UTF-16 code units (:216-233): with
  hash_count > 1 → [int0(variant), int1(variant), high 64 bits, top 32
  of low]; with hash_count == 1 → the full 128 bits.

This engine returns each token as the HEX string of those 16-bit units
(4 hex digits per unit — same information, Arrow/parquet-safe where raw
unpaired surrogates are not); ``min_hash_token_units`` exposes the raw
unit tuples for parity with the reference's own char-vector tests.

Scale shape: a per-document pure function over the analyzed token list —
runs inside the Arrow invert batches or a mapInPandas pass; no state
beyond the document, no shuffle.
"""

from __future__ import annotations

DEFAULT_HASH_COUNT = 1
DEFAULT_BUCKET_COUNT = 512
DEFAULT_HASH_SET_SIZE = 1

_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmurhash3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """(val1, val2) as UNSIGNED 64-bit ints — MurmurHash3 x64 128
    (MinHashFilter.java:412-505).  Java's signed longs and this unsigned
    arithmetic agree modulo 2^64 for every op used (mul, xor, rotl,
    add); byte-load sign extension cancels under the mask."""
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    length = len(key)
    rounded = length & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(key[i:i + 8], "little")
        k2 = int.from_bytes(key[i + 8:i + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = key[rounded:]
    nt = len(tail)
    if nt > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
    if nt > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def _int_hash(i: int) -> tuple[int, int]:
    # getIntHash: murmur of the variant index as 4 big-endian bytes
    return murmurhash3_x64_128(i.to_bytes(4, "big"))


def _combine_ordered(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    # combineOrdered (MinHashFilter.java:345): r = r*37 + h per half,
    # seeded at (0, 0) and folded over [token_hash, variant_hash]
    v1 = (a[0] * 37 + b[0]) & _M64
    v2 = (a[1] * 37 + b[1]) & _M64
    return v1, v2


def min_hash_token_units(
    tokens,
    hash_count: int = DEFAULT_HASH_COUNT,
    bucket_count: int = DEFAULT_BUCKET_COUNT,
    hash_set_size: int = DEFAULT_HASH_SET_SIZE,
    with_rotation: bool | None = None,
) -> list[tuple[int, ...]]:
    """The emitted min-hash tokens as tuples of 16-bit units, in the
    reference's emission order (variant asc, bucket asc, hash asc)."""
    if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
        raise ValueError("hash_count/bucket_count/hash_set_size must be > 0")
    if with_rotation is None:
        with_rotation = bucket_count > 1  # MinHashFilterFactory.java:66
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    # per (variant, bucket): sorted unique list of (val2, val1) —
    # unsigned compareTo orders by val2 first (LongPair.compareTo)
    sets: list[list[set]] = [
        [set() for _ in range(bucket_count)] for _ in range(hash_count)
    ]
    variant_hashes = [_int_hash(i) for i in range(hash_count)]
    found = False
    for tok in tokens:
        found = True
        th = murmurhash3_x64_128(tok.encode("utf-16-le"))
        for i in range(hash_count):
            v1, v2 = _combine_ordered(th, variant_hashes[i])
            b = (v2 >> 32) // bucket_size
            sets[i][int(b)].add((v2, v1))
    if not found:
        return []
    # FixedSizeTreeSet cap: keep the hash_set_size smallest
    mins: list[list[list]] = [
        [sorted(s)[:hash_set_size] for s in row] for row in sets
    ]
    if with_rotation and hash_set_size == 1:
        for hi in range(hash_count):
            row = mins[hi]
            for bi in range(bucket_count):
                if not row[bi]:
                    for off in range(1, bucket_count):
                        src = row[(bi + off) % bucket_count]
                        if src:
                            row[bi] = [src[0]]
                            break
    out: list[tuple[int, ...]] = []
    for hi in range(hash_count):
        for bi in range(bucket_count):
            for v2, v1 in mins[hi][bi]:
                units: list[int] = []
                if hash_count > 1:
                    units.append((hi >> 16) & 0xFFFF)
                    units.append(hi & 0xFFFF)
                for shift in (48, 32, 16, 0):
                    units.append((v2 >> shift) & 0xFFFF)
                units.append((v1 >> 48) & 0xFFFF)
                units.append((v1 >> 32) & 0xFFFF)
                if hash_count == 1:
                    units.append((v1 >> 16) & 0xFFFF)
                    units.append(v1 & 0xFFFF)
                out.append(tuple(units))
    return out


def min_hash_tokens(
    tokens,
    hash_count: int = DEFAULT_HASH_COUNT,
    bucket_count: int = DEFAULT_BUCKET_COUNT,
    hash_set_size: int = DEFAULT_HASH_SET_SIZE,
    with_rotation: bool | None = None,
) -> list[str]:
    """Hex-string form of :func:`min_hash_token_units` (4 hex digits per
    16-bit unit) — the engine's string-typed term representation."""
    return [
        "".join(f"{u:04x}" for u in units)
        for units in min_hash_token_units(
            tokens, hash_count, bucket_count, hash_set_size, with_rotation
        )
    ]
