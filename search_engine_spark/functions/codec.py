"""Posting-block codec: delta-gap + varint (unsigned LEB128) compression of
(docid, tf, positions[]) runs, with block-max metadata.

Standard IR posting compression (Manning/Raghavan/Schütze, IIR ch. 5;
block-max metadata per Ding & Suel, "Faster top-k document retrieval using
block-max indexes", SIGIR 2011). The reference stores postings as delimited
strings in KVS columns ("tf:pos1,pos2", jobs/IndexerProjectPhraseSearch.java:82-84);
this codec is the scale-path replacement.

Block layout v3 (independently decodable):
    varint n_postings
    varint first_docid                     (absolute)
    varint docid_gap  × (n-1)              (gap - 1 not used; gaps >= 1)
    varint tf         × n
    varint dl         × n                  (document length, colocated)
    per posting: varint n_pos, varint first_pos, varint pos_gap × (n_pos-1)

Positions may be empty (n_pos = 0) when the index is built without them.

The dl stream makes every block self-scoring: BM25 partials need no join
against the docs table at query time (the Lucene norms-file idea, inlined).
dl is invariant under index merge (docid shift touches only the first-docid
varint, which precedes the dl stream), and exact — scoring against the
CURRENT avgdl stays bit-identical to the oracle after any merge.
"""

from __future__ import annotations

import numpy as np

from search_engine_spark.oracle.bm25 import bm25_term_score

DEFAULT_BLOCK_SIZE = 128


def varint_encode(value: int, out: bytearray) -> None:
    if value < 0:
        raise ValueError("varint requires non-negative int")
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def varint_decode(buf: bytes, offset: int) -> tuple[int, int]:
    """Returns (value, new_offset)."""
    result = 0
    shift = 0
    while True:
        b = buf[offset]
        offset += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, offset
        shift += 7


def varints_vec(values: np.ndarray) -> bytes:
    """Vectorized LEB128 of a non-negative int64 array — byte-identical to
    repeated ``varint_encode``. O(max_bytes) numpy passes, no Python loop
    over values (the indexer's hot path)."""
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    while True:
        mask = v >= thresh
        if not mask.any():
            break
        nbytes[mask] += 1
        if int(thresh) >= (1 << 57):  # next shift would overflow uint64 cmp
            big = v >= np.uint64(1 << 63)
            nbytes[big] = np.maximum(nbytes[big], 10)
            break
        thresh = np.uint64(int(thresh) << 7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) * np.uint8(0x80)
        out[starts[mask] + k] = byte | cont
    return out.tobytes()


def encode_block_arrays(
    docids: np.ndarray,
    tfs: np.ndarray,
    pos_flat: np.ndarray | None,
    pos_lens: np.ndarray | None,
    dls: np.ndarray | None = None,
) -> bytes:
    """Vectorized ``encode_block`` over numpy arrays (identical bytes).

    pos_flat/pos_lens: concatenated position values + per-posting lengths
    (None → no positions, encoded as n_pos=0 per posting).
    dls: per-posting document lengths (None → zeros)."""
    n = len(docids)
    head = np.empty(1 + n, dtype=np.int64)
    head[0] = n
    if n == 0:
        return varints_vec(head[:1])
    head[1] = docids[0]
    head[2:] = np.diff(docids)
    if np.any(head[2:] <= 0):
        raise ValueError("docids must be strictly ascending")
    if pos_flat is None or pos_lens is None:
        pos_seq = np.zeros(n, dtype=np.int64)
    else:
        deltas = pos_flat.astype(np.int64, copy=True)
        starts = np.cumsum(pos_lens) - pos_lens
        if deltas.size:
            deltas[1:] -= pos_flat[:-1]
            nz = starts[pos_lens > 0]
            deltas[nz] = pos_flat[nz]  # restore absolutes at posting starts
        pos_seq = np.insert(deltas, starts, pos_lens)
    dl_arr = (
        np.zeros(n, dtype=np.int64)
        if dls is None
        else dls.astype(np.int64, copy=False)
    )
    vals = np.concatenate(
        [head, tfs.astype(np.int64, copy=False), dl_arr, pos_seq]
    )
    return varints_vec(vals)


def encode_block(
    docids: list[int],
    tfs: list[int],
    positions: list[list[int]] | None,
    dls: list[int] | None = None,
) -> bytes:
    """Encode one block of postings (docids strictly ascending)."""
    n = len(docids)
    out = bytearray()
    varint_encode(n, out)
    if n == 0:
        return bytes(out)
    varint_encode(docids[0], out)
    prev = docids[0]
    for d in docids[1:]:
        if d <= prev:
            raise ValueError("docids must be strictly ascending")
        varint_encode(d - prev, out)
        prev = d
    for tf in tfs:
        varint_encode(tf, out)
    for i in range(n):
        varint_encode(dls[i] if dls is not None else 0, out)
    for i in range(n):
        plist = positions[i] if positions is not None else []
        varint_encode(len(plist), out)
        if plist:
            varint_encode(plist[0], out)
            pprev = plist[0]
            for p in plist[1:]:
                varint_encode(p - pprev, out)
                pprev = p
    return bytes(out)


def decode_block(
    buf: bytes,
) -> tuple[list[int], list[int], list[int], list[list[int]]]:
    """Decode one block → (docids, tfs, dls, positions)."""
    off = 0
    n, off = varint_decode(buf, off)
    docids: list[int] = []
    tfs: list[int] = []
    dls: list[int] = []
    positions: list[list[int]] = []
    if n == 0:
        return docids, tfs, dls, positions
    d, off = varint_decode(buf, off)
    docids.append(d)
    for _ in range(n - 1):
        gap, off = varint_decode(buf, off)
        d += gap
        docids.append(d)
    for _ in range(n):
        tf, off = varint_decode(buf, off)
        tfs.append(tf)
    for _ in range(n):
        dl, off = varint_decode(buf, off)
        dls.append(dl)
    for _ in range(n):
        m, off = varint_decode(buf, off)
        if m == 0:
            positions.append([])
            continue
        p, off = varint_decode(buf, off)
        plist = [p]
        for _ in range(m - 1):
            g, off = varint_decode(buf, off)
            p += g
            plist.append(p)
        positions.append(plist)
    return docids, tfs, dls, positions


def varints_all(buf: bytes) -> "np.ndarray":
    """Vectorized LEB128 decode of an entire varint stream → int64 array.
    Inverse of ``varints_vec``; a block's full byte payload is one such
    stream, so this replaces the per-byte Python walk on the query path."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    sizes = ends - starts + 1
    within = (
        np.arange(b.size, dtype=np.int64) - np.repeat(starts, sizes)
    ).astype(np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * within)
    return np.add.reduceat(contrib, starts).astype(np.int64)


def decode_block_np(
    buf: bytes, positions: bool = False
) -> tuple:
    """Vectorized ``decode_block``: (docids, tfs, dls[, pos_lens, pos_flat])
    as int64 numpy arrays. ``positions=False`` skips assembling the
    per-posting position lists (scoring paths never need them)."""
    vals = varints_all(buf)
    n = int(vals[0]) if vals.size else 0
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return (e, e, e, e, e) if positions else (e, e, e)
    docids = np.cumsum(vals[1 : 1 + n])
    tfs = vals[1 + n : 1 + 2 * n]
    dls = vals[1 + 2 * n : 1 + 3 * n]
    if not positions:
        return docids, tfs, dls
    tail = vals[1 + 3 * n :]
    pos_lens = np.empty(n, dtype=np.int64)
    chunks = []
    i = 0
    for k in range(n):
        m = int(tail[i])
        pos_lens[k] = m
        if m:
            chunks.append(np.cumsum(tail[i + 1 : i + 1 + m]))
        i += 1 + m
    pos_flat = (
        np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    )
    return docids, tfs, dls, pos_lens, pos_flat


def decode_block_docids(buf: bytes) -> list[int]:
    """Docids only (skip tfs/positions decode for intersection-only paths)."""
    off = 0
    n, off = varint_decode(buf, off)
    if n == 0:
        return []
    d, off = varint_decode(buf, off)
    docids = [d]
    for _ in range(n - 1):
        gap, off = varint_decode(buf, off)
        d += gap
        docids.append(d)
    return docids


def split_blocks(
    docids: list[int],
    tfs: list[int],
    positions: list[list[int]] | None,
    doclen: dict[int, int] | None,
    avgdl: float,
    idf: float,
    block_size: int = DEFAULT_BLOCK_SIZE,
):
    """Split a full (sorted) posting list into encoded blocks.

    Yields (block_id, block_bytes, block_max, first_docid, last_docid, n)
    where block_max is the max exact BM25 partial score inside the block
    (requires doclen+avgdl+idf; 0.0 when doclen is None).
    """
    for bi, start in enumerate(range(0, len(docids), block_size)):
        end = min(start + block_size, len(docids))
        b_doc = docids[start:end]
        b_tf = tfs[start:end]
        b_pos = positions[start:end] if positions is not None else None
        b_dl = [doclen[d] for d in b_doc] if doclen is not None else None
        if doclen is not None:
            bmax = max(
                bm25_term_score(b_tf[i], doclen[b_doc[i]], avgdl, idf)
                for i in range(len(b_doc))
            )
        else:
            bmax = 0.0
        yield (
            bi,
            encode_block(b_doc, b_tf, b_pos, b_dl),
            bmax,
            b_doc[0],
            b_doc[-1],
            len(b_doc),
        )


_B1 = [bytes((1, p)) for p in range(128)]  # n=1, first<128: 2 bytes, interned


def encode_positions(plist: list[int]) -> bytes:
    """Per-posting positions section: varint n_pos, varint first, varint
    gaps — exactly the block format's per-posting layout, so a block's
    positions region is the raw concatenation of these (build hot path:
    called once per (doc, term)). Fast paths: the ubiquitous tf=1 case is
    an interned 2-byte lookup; gaps < 128 append as raw bytes (a 1-byte
    varint IS the value)."""
    n = len(plist)
    if n == 0:
        return b"\x00"
    first = plist[0]
    if n == 1 and first < 128:
        return _B1[first]
    out = bytearray()
    varint_encode(n, out)
    varint_encode(first, out)
    prev = first
    for p in plist[1:]:
        g = p - prev
        if g < 128:
            out.append(g)
        else:
            varint_encode(g, out)
        prev = p
    return bytes(out)


def encode_block_posbytes(
    docids: "np.ndarray",
    tfs: "np.ndarray",
    dls: "np.ndarray",
    posbytes: bytes,
) -> bytes:
    """``encode_block`` with the positions region supplied pre-encoded
    (concatenation of ``encode_positions`` outputs in docid order)."""
    n = len(docids)
    head = np.empty(1 + n, dtype=np.int64)
    head[0] = n
    if n == 0:
        return varints_vec(head[:1])
    head[1] = docids[0]
    head[2:] = np.diff(docids)
    if np.any(head[2:] <= 0):
        raise ValueError("docids must be strictly ascending")
    vals = np.concatenate(
        [
            head,
            tfs.astype(np.int64, copy=False),
            dls.astype(np.int64, copy=False),
        ]
    )
    return varints_vec(vals) + posbytes
