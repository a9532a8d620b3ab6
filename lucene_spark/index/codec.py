"""Posting-list block codec: delta + varint, 128-entry blocks, impacts.

Re-expresses the reference's postings compression (SURVEY.md §2.4) as pure
vectorized numpy, for use inside Arrow/pandas UDFs (never per-row Python):

* ``Lucene99PostingsWriter`` streams each term's postings into blocks of 128
  docs: doc-deltas bit-packed, tail as VInt
  (reference: core/codecs/lucene99/Lucene99PostingsWriter.java:214,246-248,
  ForUtil.java:32 ``BLOCK_SIZE=128``).  Here: doc-deltas + freqs + position
  deltas are LEB128-varint encoded (the north rule names delta/varint).
* Per block, skip metadata carries the block's last doc and the competitive
  impacts ``(max_freq, min_norm)`` — the data behind block-max WAND
  (reference: Lucene99SkipWriter.java:48,153 and
  CompetitiveImpactAccumulator.java:30,71; consumed by MaxScoreCache.java:34).
  We store ``(last_doc, max_freq, min_norm, byte offsets)`` per 128-block.

Encode and decode are O(total bytes) with a bounded number (<= 10) of
whole-array numpy passes — no Python loops over values.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # reference: ForUtil.java:32

# dtype of the per-block skip/impact record (structured array <-> Arrow)
SKIP_FIELDS = ["last_doc", "max_freq", "min_norm", "off_docs", "off_freqs", "off_pos", "n"]


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value: ceil(bit_length / 7), min 1."""
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return nbytes


def _varint_bytes(v: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Scatter LEB128 bytes for values ``v`` with known lengths (vectorized)."""
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]) if ends.size else 0, dtype=np.uint8)
    max_len = int(nbytes.max()) if nbytes.size else 0
    for j in range(max_len):
        sel = nbytes > j
        byte = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > j + 1).astype(np.uint8) << 7
        out[starts[sel] + j] = byte | cont
    return out


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 encode a non-negative int array (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _varint_bytes(v, varint_lengths(v)).tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes to an int64 array (vectorized)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    value_id = np.repeat(np.arange(ends.size), lengths)
    idx_in_value = np.arange(b.size) - starts[value_id]
    shifted = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * idx_in_value.astype(np.uint64)
    )
    vals = np.bitwise_or.reduceat(shifted, starts)
    return vals.astype(np.int64)


def encode_posting_list(
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    norms: np.ndarray,
    positions: list | None = None,
) -> dict:
    """Encode one term's (sorted) postings into the packed block format.

    Returns dict with binary payloads + per-block skip/impact metadata:
      docs_enc:  varint(delta(doc_ids))  (first doc absolute)
      freqs_enc: varint(freqs)
      norms_enc: raw uint8 per doc (byte4-quantized lengths)
      pos_enc:   varint(per-doc delta positions, concatenated) or None
      skip:      list of per-128-block dicts (SKIP_FIELDS)
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = doc_ids.size
    deltas = np.diff(doc_ids, prepend=np.int64(0))
    deltas[0] = doc_ids[0] if n else 0

    skip = []
    docs_parts, freqs_parts, pos_parts = [], [], []
    off_d = off_f = off_p = 0
    if positions is not None:
        pos_arrays = [np.asarray(p, dtype=np.int64) for p in positions]
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        d_enc = varint_encode(deltas[s:e])
        f_enc = varint_encode(freqs[s:e])
        if positions is not None:
            block_pos = [np.diff(p, prepend=np.int64(0)) for p in pos_arrays[s:e]]
            p_enc = varint_encode(
                np.concatenate(block_pos) if block_pos else np.empty(0, np.int64)
            )
        else:
            p_enc = b""
        skip.append(
            {
                "last_doc": int(doc_ids[e - 1]),
                "max_freq": int(freqs[s:e].max()),
                "min_norm": int(norms[s:e].min()),
                "off_docs": off_d,
                "off_freqs": off_f,
                "off_pos": off_p,
                "n": e - s,
            }
        )
        docs_parts.append(d_enc)
        freqs_parts.append(f_enc)
        pos_parts.append(p_enc)
        off_d += len(d_enc)
        off_f += len(f_enc)
        off_p += len(p_enc)
    return {
        "docs_enc": b"".join(docs_parts),
        "freqs_enc": b"".join(freqs_parts),
        "norms_enc": norms.astype(np.uint8).tobytes(),
        "pos_enc": b"".join(pos_parts) if positions is not None else None,
        "skip": skip,
    }


def decode_posting_list(
    docs_enc: bytes,
    freqs_enc: bytes,
    norms_enc: bytes,
    skip: list | None = None,
    pos_enc: bytes | None = None,
):
    """Decode the packed format back to (doc_ids, freqs, norms[, positions]).

    Blocks are delta-encoded independently except the first delta of each
    block continues the running prefix sum, so a plain cumsum over the whole
    concatenated delta stream reconstructs absolute doc ids.
    """
    deltas = varint_decode(docs_enc)
    doc_ids = np.cumsum(deltas)
    freqs = varint_decode(freqs_enc)
    norms = np.frombuffer(norms_enc, dtype=np.uint8).astype(np.int64)
    if pos_enc is None:
        return doc_ids, freqs, norms
    flat = varint_decode(pos_enc)
    # positions are per-doc delta streams of length freq, concatenated;
    # segmented cumsum: global cumsum minus the running total at each
    # segment start (vectorized, no Python loop over docs)
    starts = np.concatenate(([0], np.cumsum(freqs)[:-1])).astype(np.int64)
    total = np.cumsum(flat)
    seg_base = np.where(starts > 0, total[np.maximum(starts - 1, 0)], 0)
    positions = total - np.repeat(seg_base, freqs.astype(np.int64))
    pos_lists = np.split(positions, starts[1:]) if flat.size else []
    return doc_ids, freqs, norms, pos_lists


def encode_posting_lists_batch(
    row_doc_ids: list,
    row_freqs: list,
    row_norms: list,
    row_positions: list | None = None,
) -> list[dict]:
    """Encode MANY posting lists at once with whole-batch vectorization.

    The per-posting work (delta, varint byte computation, per-block impact
    reduction) runs as single numpy passes over the concatenation of all
    lists; Python-level iteration only happens per output row (byte-slicing)
    and per 128-block (skip-record assembly) — 128x fewer than postings.

    Each input list element is a 1-D int array for one (term, chunk) group,
    postings sorted by doc_id.  Returns one dict per row shaped like
    ``encode_posting_list``'s output.
    """
    nrows = len(row_doc_ids)
    if nrows == 0:
        return []
    lens = np.array([len(a) for a in row_doc_ids], dtype=np.int64)
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    docs = np.concatenate(row_doc_ids).astype(np.int64)
    freqs = np.concatenate(row_freqs).astype(np.int64)
    norms = np.concatenate(row_norms).astype(np.int64)
    n = docs.size

    # segmented delta: plain diff, then restore absolutes at each row start
    deltas = np.diff(docs, prepend=np.int64(0))
    deltas[row_starts] = docs[row_starts]

    # block structure: one block per 128 postings *within each row*
    nblocks = (lens + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_row = np.repeat(np.arange(nrows), nblocks)
    blk_starts_total = np.concatenate(([0], np.cumsum(nblocks)[:-1]))
    blk_local = np.arange(blk_row.size) - blk_starts_total[blk_row]
    bstart = row_starts[blk_row] + BLOCK_SIZE * blk_local
    bend = np.minimum(bstart + BLOCK_SIZE, row_starts[blk_row] + lens[blk_row])

    blk_max_freq = np.maximum.reduceat(freqs, bstart) if n else np.empty(0, np.int64)
    blk_min_norm = np.minimum.reduceat(norms, bstart) if n else np.empty(0, np.int64)
    blk_last_doc = docs[bend - 1]

    # one varint pass over the whole batch for docs and freqs
    dlen = varint_lengths(deltas)
    flen = varint_lengths(freqs)
    dbytes = _varint_bytes(deltas.astype(np.uint64), dlen)
    fbytes = _varint_bytes(freqs.astype(np.uint64), flen)
    dcum = np.concatenate(([0], np.cumsum(dlen)))
    fcum = np.concatenate(([0], np.cumsum(flen)))

    with_pos = row_positions is not None
    if with_pos:
        plens = [
            np.array([len(p) for p in row], dtype=np.int64) for row in row_positions
        ]
        flat_pos = (
            np.concatenate([np.concatenate(row) if len(row) else np.empty(0, np.int64) for row in row_positions])
            if n
            else np.empty(0, np.int64)
        ).astype(np.int64)
        # per-doc delta restart: position stream starts at every doc boundary
        doc_pos_lens = np.concatenate(plens) if n else np.empty(0, np.int64)
        pos_doc_starts = np.concatenate(([0], np.cumsum(doc_pos_lens)[:-1]))
        pdeltas = np.diff(flat_pos, prepend=np.int64(0))
        pdeltas[pos_doc_starts] = flat_pos[pos_doc_starts]
        plen_b = varint_lengths(pdeltas)
        pbytes = _varint_bytes(pdeltas.astype(np.uint64), plen_b)
        pcum_by_posting = np.concatenate(([0], np.cumsum(plen_b)))
        # byte offset of each posting's position stream
        posting_pos_start = pcum_by_posting[pos_doc_starts]
        posting_pos_start = np.concatenate((posting_pos_start, [pcum_by_posting[-1]]))

    norms_u8 = norms.astype(np.uint8)

    # assemble per-row payloads (Python loop over rows + blocks only)
    out: list[dict] = []
    dview, fview = memoryview(dbytes.tobytes()), memoryview(fbytes.tobytes())
    if with_pos:
        pview = memoryview(pbytes.tobytes())
    mview = memoryview(norms_u8.tobytes())
    bi = 0
    for r in range(nrows):
        s, e = row_starts[r], row_starts[r] + lens[r]
        skip = []
        for _ in range(int(nblocks[r])):
            bs, be = int(bstart[bi]), int(bend[bi])
            skip.append(
                {
                    "last_doc": int(blk_last_doc[bi]),
                    "max_freq": int(blk_max_freq[bi]),
                    "min_norm": int(blk_min_norm[bi]),
                    "off_docs": int(dcum[bs] - dcum[s]),
                    "off_freqs": int(fcum[bs] - fcum[s]),
                    "off_pos": int(posting_pos_start[bs] - posting_pos_start[s]) if with_pos else 0,
                    "n": be - bs,
                }
            )
            bi += 1
        out.append(
            {
                "docs_enc": bytes(dview[int(dcum[s]) : int(dcum[e])]),
                "freqs_enc": bytes(fview[int(fcum[s]) : int(fcum[e])]),
                "norms_enc": bytes(mview[int(s) : int(e)]),
                "pos_enc": bytes(pview[int(posting_pos_start[s]) : int(posting_pos_start[e])]) if with_pos else None,
                "skip": skip,
            }
        )
    return out


def decode_selected_blocks(
    docs_enc: bytes,
    freqs_enc: bytes,
    norms_enc: bytes,
    skip: list,
    keep: np.ndarray,
):
    """Decode only the blocks where ``keep`` is True, using skip offsets.

    ≙ ImpactsDISI.advanceTarget skipping whole blocks whose impacts can't
    compete (reference: core/search/ImpactsDISI.java:68-104).  The first
    delta of block ``i`` continues from block ``i-1``'s last doc, which the
    skip entry carries, so any subset of blocks decodes independently.
    Contiguous kept runs decode as one varint pass.
    """
    nb = len(skip)
    doc_parts, freq_parts, norm_parts = [], [], []
    total_d, total_f = len(docs_enc), len(freqs_enc)
    posting_starts = np.cumsum([0] + [s["n"] for s in skip])
    i = 0
    while i < nb:
        if not keep[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and keep[j + 1]:
            j += 1
        d0 = skip[i]["off_docs"]
        d1 = skip[j + 1]["off_docs"] if j + 1 < nb else total_d
        f0 = skip[i]["off_freqs"]
        f1 = skip[j + 1]["off_freqs"] if j + 1 < nb else total_f
        base = skip[i - 1]["last_doc"] if i > 0 else 0
        deltas = varint_decode(docs_enc[d0:d1])
        doc_parts.append(np.cumsum(deltas) + base)
        freq_parts.append(varint_decode(freqs_enc[f0:f1]))
        p0, p1 = posting_starts[i], posting_starts[j + 1]
        norm_parts.append(
            np.frombuffer(norms_enc[p0:p1], dtype=np.uint8).astype(np.int64)
        )
        i = j + 1
    if not doc_parts:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(doc_parts),
        np.concatenate(freq_parts),
        np.concatenate(norm_parts),
    )
