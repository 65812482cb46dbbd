import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_approx_plugin_spark.functions.varint import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    np.testing.assert_array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
def test_delta_roundtrip(values):
    v = np.sort(np.array(values, dtype=np.uint64))
    np.testing.assert_array_equal(delta_varint_decode(delta_varint_encode(v)), v)


def test_decode_doc_rows_roundtrip_property():
    """Property: for ANY set of per-row sorted docID lists, the flat
    concatenated-blob decode (_decode_doc_rows) returns exactly the
    concatenation of the original absolute ids."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from elasticsearch_approx_plugin_spark.operators.postings import _decode_doc_rows
    from elasticsearch_approx_plugin_spark.functions.varint import delta_varint_encode

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(0, 2**62), min_size=1, max_size=30).map(
                lambda xs: sorted(set(xs))
            ),
            min_size=1,
            max_size=12,
        )
    )
    def run(rows):
        blobs = [delta_varint_encode(np.array(r, dtype=np.uint64)) for r in rows]
        counts = np.array([len(r) for r in rows], dtype=np.int64)
        col = pa.array(blobs, type=pa.binary())
        got = _decode_doc_rows(col, counts)
        exp = np.concatenate([np.array(r, dtype=np.uint64) for r in rows])
        np.testing.assert_array_equal(got, exp)

    run()


def test_merge_partition_unit():
    """_merge_partition directly on crafted Arrow batches: singleton
    groups pass through byte-identical; split groups merge to the
    byte-exact single-row encoding of the union."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_approx_plugin_spark.operators.postings import _merge_partition
    from elasticsearch_approx_plugin_spark.functions.varint import (
        delta_varint_encode,
        varint_encode,
    )

    def row(term, rid, docs, tfs, dls, mt):
        docs = np.array(docs, dtype=np.uint64)
        return {
            "term": term, "range_id": rid,
            "df_part": len(docs), "cf_part": int(sum(tfs)),
            "max_tfnorm": mt,
            "doc_ids": delta_varint_encode(docs),
            "tfs": varint_encode(np.array(tfs, dtype=np.uint64)),
            "dls": varint_encode(np.array(dls, dtype=np.uint64)),
        }

    rows = [
        row("alpha", 0, [3, 9], [1, 2], [10, 20], 1.5),        # split, part 1
        row("alpha", 0, [5, 700], [7, 1], [30, 40], 1.2),      # split, part 2
        row("alpha", 1, [2], [4], [9], 2.0),                    # singleton
        row("beta", 0, [1, 2, 3], [1, 1, 1], [5, 5, 5], 0.7),  # singleton
        row("beta", 7, [100], [9], [50], 3.0),                  # split, part 1
        row("beta", 7, [42], [2], [60], 0.5),                   # split, part 2
    ]
    schema = pa.schema(
        [
            ("term", pa.string()), ("range_id", pa.int64()),
            ("df_part", pa.int64()), ("cf_part", pa.int64()),
            ("max_tfnorm", pa.float64()), ("doc_ids", pa.binary()),
            ("tfs", pa.binary()), ("dls", pa.binary()),
        ]
    )
    batch = pa.RecordBatch.from_pylist(rows, schema=schema)
    out = {}
    for b in _merge_partition(iter([batch])):
        for r in b.to_pylist():
            out[(r["term"], r["range_id"])] = r

    assert set(out) == {("alpha", 0), ("alpha", 1), ("beta", 0), ("beta", 7)}
    # singletons byte-identical
    assert out[("alpha", 1)]["doc_ids"] == rows[2]["doc_ids"]
    assert out[("beta", 0)]["tfs"] == rows[3]["tfs"]
    # merged group == byte-exact single-row encode of the doc-sorted union
    exp = row("alpha", 0, [3, 5, 9, 700], [1, 7, 2, 1], [10, 30, 20, 40], 1.5)
    got = out[("alpha", 0)]
    assert got["df_part"] == 4 and got["cf_part"] == 11
    assert got["max_tfnorm"] == 1.5
    assert got["doc_ids"] == exp["doc_ids"]
    assert got["tfs"] == exp["tfs"]
    assert got["dls"] == exp["dls"]
    got2 = out[("beta", 7)]
    exp2 = row("beta", 7, [42, 100], [2, 9], [60, 50], 3.0)
    assert got2["doc_ids"] == exp2["doc_ids"]
    assert got2["tfs"] == exp2["tfs"]
    assert got2["dls"] == exp2["dls"]
    assert got2["max_tfnorm"] == 3.0
