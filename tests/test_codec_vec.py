"""Vectorized codec ≡ scalar codec, byte-identical."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from search_engine_spark.functions.codec import (
    decode_block,
    decode_block_np,
    encode_block,
    encode_block_arrays,
    varint_decode,
    varints_all,
    varints_vec,
)


def test_varints_vec_matches_scalar():
    vals = [0, 1, 127, 128, 300, 16383, 16384, 2**21 - 1, 2**32, 2**59]
    from search_engine_spark.functions.codec import varint_encode

    scalar = bytearray()
    for v in vals:
        varint_encode(v, scalar)
    assert varints_vec(np.array(vals, dtype=np.int64)) == bytes(scalar)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**60 - 1), max_size=50))
def test_varints_vec_roundtrip(vals):
    buf = varints_vec(np.array(vals, dtype=np.int64))
    off = 0
    out = []
    for _ in vals:
        v, off = varint_decode(buf, off)
        out.append(v)
    assert out == vals and off == len(buf)
    assert varints_all(buf).tolist() == vals  # vectorized full-stream decode


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),  # docid gaps
            st.integers(min_value=1, max_value=9),   # tf
            st.lists(st.integers(min_value=1, max_value=30), max_size=5),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_encode_arrays_matches_scalar(rows):
    docids, tfs, positions = [], [], []
    d = 0
    for gap, tf, pos_gaps in rows:
        d += gap
        docids.append(d)
        tfs.append(tf)
        p, plist = 0, []
        for g in pos_gaps:
            p += g
            plist.append(p)
        positions.append(plist)
    dls = [100 + (d % 37) for d in docids]
    scalar = encode_block(docids, tfs, positions, dls)
    lens = np.array([len(p) for p in positions], dtype=np.int64)
    flat = (
        np.concatenate([np.array(p, dtype=np.int64) for p in positions])
        if positions and lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    vec = encode_block_arrays(
        np.array(docids, dtype=np.int64),
        np.array(tfs, dtype=np.int64),
        flat,
        lens,
        np.array(dls, dtype=np.int64),
    )
    assert vec == scalar
    assert decode_block(vec) == (docids, tfs, dls, positions)
    # vectorized decoder ≡ scalar decoder
    nd, nt, nl, plens, pflat = decode_block_np(vec, positions=True)
    assert nd.tolist() == docids and nt.tolist() == tfs
    assert nl.tolist() == dls
    assert plens.tolist() == [len(p) for p in positions]
    flat = [p for pl in positions for p in pl]
    assert pflat.tolist() == flat
    d3, t3, l3 = decode_block_np(vec)
    assert d3.tolist() == docids and t3.tolist() == tfs and l3.tolist() == dls


def test_encode_arrays_no_positions():
    docids = np.array([3, 7, 8], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    vec = encode_block_arrays(docids, tfs, None, None)
    assert vec == encode_block([3, 7, 8], [1, 2, 3], None)
    d, t, dl, p = decode_block(vec)
    assert d == [3, 7, 8] and t == [1, 2, 3] and p == [[], [], []]
    assert dl == [0, 0, 0]  # dls omitted → zero-filled stream
