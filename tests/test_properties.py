"""Property tests (hypothesis): merge idempotence and replay-order
independence of the snapshot table — the exactly-once core, hammered with
generated event sequences instead of curated scenarios."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from debezium_connector_cockroachdb_spark.sources.lake import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("v", T.IntegerType(), True),
])
UPD_DDL = "doc_id string, v int, op string, commit_wall_ns long, commit_logical long, seq long"

# event: (key 0-3, op, wall 1-5, seq unique via index)
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["c", "u", "d"]), st.integers(1, 5)),
    min_size=1, max_size=8,
)


def apply_events(spark, path, events, mode):
    t = SnapshotTable.create(path, SCHEMA, "doc_id", num_buckets=2,
                             properties={"write.merge.mode": mode})
    rows = [
        (f"k{k}", (None if op == "d" else w * 10 + k), op, w, 0, i)
        for i, (k, op, w) in enumerate(events)
    ]
    # split into two batches to exercise cross-batch guard behavior
    half = len(rows) // 2
    for bi, chunk in enumerate([rows[:half], rows[half:]]):
        if chunk:
            # one row per key per batch (merge contract): keep max (wall, seq)
            best = {}
            for r in chunk:
                cur = best.get(r[0])
                if cur is None or (r[3], r[5]) > (cur[3], cur[5]):
                    best[r[0]] = r
            t.merge(spark, spark.createDataFrame(list(best.values()), UPD_DDL), f"b{bi}")
    return {r["doc_id"]: r["v"] for r in t.read_state(spark).collect()}


def python_oracle(events):
    state = {}
    half = len(events) // 2
    batches = [events[:half], events[half:]]
    applied = {}  # key -> (wall, seq) of last applied
    for chunk_idx, chunk in enumerate(batches):
        best = {}
        base = 0 if chunk_idx == 0 else half
        for off, (k, op, w) in enumerate(chunk):
            i = base + off
            cur = best.get(k)
            if cur is None or (w, i) > (cur[2], cur[3]):
                best[k] = (op, w * 10 + k, w, i)
        for k, (op, val, w, i) in best.items():
            prev = applied.get(f"k{k}")
            if prev is None or (w, 0, i) > prev:
                applied[f"k{k}"] = (w, 0, i)
                if op == "d":
                    state.pop(f"k{k}", None)
                    state[f"k{k}"] = None  # tombstone marker
                else:
                    state[f"k{k}"] = val
    return {k: v for k, v in state.items() if v is not None}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy)
def test_merge_matches_python_oracle_both_modes(spark, tmp_path_factory, events):
    base = tmp_path_factory.mktemp("prop")
    want = python_oracle(events)
    got_cow = apply_events(spark, str(base / "cow"), events, "cow")
    got_mor = apply_events(spark, str(base / "mor"), events, "mor")
    assert got_cow == want, f"cow: {events}"
    assert got_mor == want, f"mor: {events}"
