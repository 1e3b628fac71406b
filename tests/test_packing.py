"""Distributed sequence packing: contiguous doc-order token windows via
the two-phase prefix sum (operators/packing.py)."""

from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.operators.packing import (
    pack_sequences,
    pack_sequences_slices,
)

CAP = 64


def _ground_truth(rows):
    out, s = {}, 0
    for i, n in sorted(rows):
        out[i] = (s // CAP, s % CAP)
        s += n
    return out


def test_packing_matches_sequential_ground_truth(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, CAP, num_buckets=7).collect()
    }
    assert got == _ground_truth(rows)


def test_packing_invariants_and_bucket_independence(spark):
    rows = [(i * 3 + 1, (i * 13) % 40 + 1) for i in range(200)]  # sparse ids
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = pack_sequences(df, CAP, num_buckets=3).collect()
    b = pack_sequences(df, CAP, num_buckets=17).collect()
    # bucket count is a parallelism knob, never a semantics knob
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_id = sorted((r["doc_id"], r["pack_id"], r["pack_offset"]) for r in a)
    assert by_id[0][1:] == (0, 0)                      # stream starts at pack 0
    assert all(0 <= off < CAP for _, _, off in by_id)  # offsets within capacity
    packs = [p for _, p, _ in by_id]
    assert packs == sorted(packs)                      # monotone in doc order


def test_packing_no_global_single_partition_sort(spark):
    """The scale property: no stage may sort the whole dataset in one
    partition (the naive global ordered window would)."""
    import contextlib
    import io

    df = spark.createDataFrame([(i, 5) for i in range(100)], "doc_id long, n_tok long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_sequences(df, CAP, num_buckets=8).explain("formatted")
    plan = buf.getvalue()
    # the local window partitions by bucket -> hashpartitioning exchange,
    # never a SinglePartition exchange feeding a Sort/Window
    assert "SinglePartition" not in plan


def test_packing_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tok long")
    assert pack_sequences(df, CAP).count() == 0


def _slice_ground_truth(rows):
    """Sequential fold of boundary-spanning slices."""
    out, s = [], 0
    for i, n in sorted(rows):
        if n == 0:
            s += n
            continue
        for p in range(s // CAP, (s + n - 1) // CAP + 1):
            g0, g1 = max(s, p * CAP), min(s + n, (p + 1) * CAP)
            out.append((i, n, p, g0 - s, g1 - g0, g0 - p * CAP))
        s += n
    return sorted(out)


def test_packing_slices_match_ground_truth_and_reconstruct(spark):
    # lengths up to 3x capacity so some docs span >2 packs
    rows = [(i, (i * 53) % (3 * CAP + 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = sorted(
        (r["doc_id"], r["n_tok"], r["pack_id"], r["slice_start"],
         r["slice_len"], r["pack_offset"])
        for r in pack_sequences_slices(df, CAP, num_buckets=7).collect()
    )
    assert got == _slice_ground_truth(rows)
    # a document's slices concatenate to exactly [0, n_tok)
    by_doc = {}
    for d, n, p, ss, sl, _po in got:
        by_doc.setdefault((d, n), []).append((p, ss, sl))
    for (d, n), slices in by_doc.items():
        slices.sort()
        assert slices[0][1] == 0
        pos = 0
        for _p, ss, sl in slices:
            assert ss == pos and sl > 0
            pos += sl
        assert pos == n


def test_packing_slices_full_packs_property(spark):
    """Every pack except the last is filled to exactly CAP tokens; the
    last holds the remainder. Zero-length docs emit no slice rows."""
    rows = [(i, (i * 29) % 150) for i in range(200)]  # includes n_tok=0 docs
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    res = pack_sequences_slices(df, CAP, num_buckets=5).collect()
    assert all(r["slice_len"] > 0 for r in res)
    fills = {}
    for r in res:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["slice_len"]
    total = sum(n for _, n in rows)
    last = max(fills)
    assert set(fills) == set(range(last + 1))  # contiguous pack ids
    for p, f in fills.items():
        assert f == CAP if p < last else f == total - last * CAP


def test_packing_slices_consistent_with_pack_sequences(spark):
    """The first slice of every document sits exactly where
    pack_sequences places the document."""
    rows = [(i, (i * 17) % 200 + 1) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    flat = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, CAP, num_buckets=4).collect()
    }
    first_slices = {}
    for r in pack_sequences_slices(df, CAP, num_buckets=4).collect():
        cur = first_slices.get(r["doc_id"])
        if cur is None or r["pack_id"] < cur[0]:
            first_slices[r["doc_id"]] = (r["pack_id"], r["pack_offset"])
    assert first_slices == flat


def test_packing_property_random_shapes(spark):
    """Hypothesis: for arbitrary sparse id sets and token lengths
    (including zero-length docs), the distributed result equals the
    sequential fold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9),
                  st.integers(min_value=0, max_value=200)),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"])
            for r in pack_sequences(df, CAP, num_buckets=5).collect()
        }
        assert got == _ground_truth(rows)

    check()


def test_assemble_packs_segments(spark):
    """Per-pack assembly: segments ordered by pack_offset, contiguous
    (offset[i+1] = offset[i] + len[i], starting at 0), summing to CAP for
    every pack except the last — the block-diagonal attention-mask
    contract a packed dataloader relies on."""
    from debezium_connector_cockroachdb_spark.operators.packing import assemble_packs

    rows = [(i, (i * 53) % (2 * CAP + 20) + 1) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    packs = {r["pack_id"]: r for r in
             assemble_packs(pack_sequences_slices(df, CAP, num_buckets=6)).collect()}
    total = sum(n for _, n in rows)
    last = max(packs)
    assert set(packs) == set(range(last + 1))
    for p, r in packs.items():
        assert r["n_slices"] == len(r["doc_ids"]) == len(r["slice_lens"])
        assert r["pack_offsets"][0] == 0
        for i in range(r["n_slices"] - 1):
            assert r["pack_offsets"][i + 1] == r["pack_offsets"][i] + r["slice_lens"][i]
        assert r["n_tokens"] == sum(r["slice_lens"])
        assert r["n_tokens"] == (CAP if p < last else total - last * CAP)
    # cross-check doc ranges: slice_starts/lens of one doc cover [0, n_tok)
    seen = {}
    for r in packs.values():
        for d, ss, sl in zip(r["doc_ids"], r["slice_starts"], r["slice_lens"]):
            seen.setdefault(d, []).append((ss, sl))
    for d, n in rows:
        segs = sorted(seen[d])
        assert segs[0][0] == 0 and sum(sl for _, sl in segs) == n


def test_packing_slices_nonidentifier_column_names(spark):
    """len/id column names that aren't plain SQL identifiers must work —
    the slice arithmetic may not interpolate them into expr strings."""
    rows = [(i, (i * 7) % 90 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "`doc id` long, `n-tok` long")
    got = sorted(
        (r["doc id"], r["pack_id"], r["slice_start"], r["slice_len"])
        for r in pack_sequences_slices(df, CAP, id_col="doc id", len_col="n-tok",
                                       num_buckets=3).collect()
    )
    want = sorted(
        (d, p, ss, sl) for d, _n, p, ss, sl, _po in
        _slice_ground_truth([(i, n) for i, n in rows])
    )
    assert got == want


def test_packing_slices_property_random_shapes(spark):
    """Hypothesis: for arbitrary sparse ids and lengths (zero-length docs,
    multi-window documents), the distributed slice rows equal the
    sequential fold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9),
                  st.integers(min_value=0, max_value=3 * CAP + 7)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        got = sorted(
            (r["doc_id"], r["n_tok"], r["pack_id"], r["slice_start"],
             r["slice_len"], r["pack_offset"])
            for r in pack_sequences_slices(df, CAP, num_buckets=5).collect()
        )
        assert got == _slice_ground_truth(rows)

    check()
