"""Token-space operators (operators/tokens.py): deterministic hashed
tokenization, polynomial fingerprints, n-gram ids, and token-space
dedup/decontamination — each pinned against a pure-Python oracle."""

import hashlib
import re

from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.operators import tokens as tok

SF = "/root/testdata/sf0.001"
P, B, SEED, V = 2147483647, 131, 7, 32768


def _py_tokens(text: str) -> list[int]:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    return [
        int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % V
        for w in norm.split(" ")
        if w != ""
    ]


def _py_fp(ts: list[int]) -> int:
    acc = SEED
    for t in ts:
        acc = (acc * B + t) % P
    return acc


def _py_grams(ts: list[int], n: int = 3) -> list[int]:
    out = []
    for i in range(len(ts) - n + 1):
        h = ts[i]
        for j in range(1, n):
            h = (h * B + ts[i + j]) % P
        out.append(h)
    seen: set[int] = set()
    uniq = []
    for g in out:
        if g not in seen:
            seen.add(g)
            uniq.append(g)
    return uniq


def test_hashed_tokens_and_fingerprint_match_python(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: (list(r["toks"]), r["fp"])
        for r in d.select(
            "doc_id",
            tok.hashed_tokens(F.col("text"), V).alias("toks"),
            tok.token_fingerprint(tok.hashed_tokens(F.col("text"), V)).alias("fp"),
        ).collect()
    }
    for r in d.select("doc_id", "text").collect():
        ts = _py_tokens(r["text"])
        assert got[r["doc_id"]] == (ts, _py_fp(ts)), r["doc_id"]


def test_fingerprint_is_order_sensitive_and_seeded_on_empty(spark):
    df = spark.createDataFrame(
        [(1, [3, 4, 5]), (2, [5, 4, 3]), (3, []), (4, [3, 4, 5])],
        "id int, toks array<int>",
    )
    fp = {r["id"]: r["f"] for r in df.select("id", tok.token_fingerprint(F.col("toks")).alias("f")).collect()}
    assert fp[1] == fp[4] != fp[2]
    assert fp[3] == SEED
    assert fp[1] == _py_fp([3, 4, 5])


def test_dedup_exact_tokens_groups_whitespace_case_variants(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "The  quick   BROWN fox"),  # same token ids
        (3, "the quick brown bat"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    groups = tok.dedup_exact_tokens(
        d.select("doc_id", tok.hashed_tokens(F.col("text"), V).alias("tokens"))
    ).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep == {1: 2, 3: 1}


def test_token_ngram_ids_windows_and_short_sequences(spark):
    df = spark.createDataFrame(
        [(1, [10, 20, 30, 40]), (2, [10, 20]), (3, None)],
        "id int, toks array<int>",
    )
    got = {
        r["id"]: (list(r["g"]) if r["g"] is not None else None)
        for r in df.select("id", tok.token_ngram_ids(F.col("toks"), 3).alias("g")).collect()
    }
    assert got[1] == _py_grams([10, 20, 30, 40])
    assert got[2] == []  # shorter than n — no descending-sequence trap
    assert got[3] is None


def test_token_contamination_matches_python(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    rows = [(r["doc_id"], r["text"]) for r in d.collect()]
    bench_ids = {g for i, t in rows if i % 10 == 0 for g in _py_grams(_py_tokens(t))}
    want = {}
    for i, t in rows:
        if i % 10 == 0:
            continue
        grams = _py_grams(_py_tokens(t))
        if grams:
            want[i] = (len(grams), sum(1 for g in grams if g in bench_ids))

    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated"])
        for r in tok.token_ngram_contamination(
            d.filter(F.col("doc_id") % 10 != 0), d.filter(F.col("doc_id") % 10 == 0)
        ).collect()
    }
    assert got == want


# ---------------- property tests (hypothesis) ----------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_tok_lists = st.lists(st.integers(min_value=0, max_value=V - 1), max_size=12)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_tok_lists, b=_tok_lists)
def test_fingerprint_concat_property(spark, a, b):
    """fp(a ++ b) must equal folding b on top of fp(a) — the invariant
    that makes the fingerprint streamable/chunkable (a resumed job can
    continue a sequence's hash without re-reading its prefix)."""
    df = spark.createDataFrame(
        [(1, a + b)], "id int, toks array<long>"
    ).select(tok.token_fingerprint(F.col("toks")).alias("f"))
    got = df.first()["f"]
    acc = _py_fp(a)
    for t in b:
        acc = (acc * B + t) % P
    assert got == acc


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=40, unique_by=lambda r: r[0],
    ),
    cap=st.integers(1, 5),
)
def test_domain_cap_property(spark, rows, cap):
    """sample_domain_cap == the python rank oracle for arbitrary id/domain
    layouts and caps (incl. domains smaller than the cap)."""
    from test_sampling import _py_domain_cap

    from debezium_connector_cockroachdb_spark.operators.sampling import sample_domain_cap

    d = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r["doc_id"], r["source"])
        for r in sample_domain_cap(d, "source", cap, salt="h", n_salt=4).collect()
    }
    assert got == _py_domain_cap(rows, cap, "h")
