"""Deterministic stratified sampling (operators/sampling.py)."""

from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.operators.sampling import (
    sample_stratified,
    unit_uniform,
)

SF = "/root/testdata/sf0.001"


def test_sample_is_deterministic_and_partition_independent(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    kept1 = {r["doc_id"] for r in sample_stratified(
        d, "lang", {"en": 0.5}, default_fraction=0.1, salt="s1").select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in sample_stratified(
        d.repartition(17), "lang", {"en": 0.5}, default_fraction=0.1, salt="s1"
    ).select("doc_id").collect()}
    assert kept1 == kept2 and kept1  # same rows regardless of layout

    # a different salt draws a genuinely different sample
    kept3 = {r["doc_id"] for r in sample_stratified(
        d, "lang", {"en": 0.5}, default_fraction=0.1, salt="s2").select("doc_id").collect()}
    assert kept3 != kept1


def test_sample_rates_concentrate_per_stratum(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    fr = {"en": 0.5, "de": 0.2}
    got = (
        sample_stratified(d, "lang", fr, default_fraction=0.0, salt="rate")
        .groupBy("lang").agg(F.count("*").alias("k"))
    )
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["k"] for r in got.collect()}
    assert set(kept) <= set(fr)  # default 0 drops unlisted strata entirely
    for lang, f in fr.items():
        rate = kept.get(lang, 0) / totals[lang]
        assert abs(rate - f) < 0.15, (lang, rate, f)


def test_unit_uniform_range_and_stability(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    u = d.select(unit_uniform(F.col("doc_id"), "x").alias("u"))
    row = u.agg(F.min("u").alias("lo"), F.max("u").alias("hi")).first()
    assert 0.0 <= row["lo"] and row["hi"] < 1.0


# ---------------- per-domain quota sampling ----------------

def _py_domain_cap(rows, cap, salt):
    """Reference selection: rank by (md5-48(id||salt), id) within domain."""
    import hashlib

    by_dom = {}
    for doc_id, source in rows:
        h = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:12], 16)
        by_dom.setdefault(source, []).append((h, doc_id))
    keep = set()
    for dom, hs in by_dom.items():
        for _h, doc_id in sorted(hs)[:cap]:
            keep.add((doc_id, dom))
    return keep


def test_domain_cap_matches_python_oracle_and_is_layout_free(spark):
    from debezium_connector_cockroachdb_spark.operators.sampling import sample_domain_cap

    d = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [(r["doc_id"], r["source"]) for r in d.select("doc_id", "source").collect()]
    want = _py_domain_cap(rows, cap=3, salt="t1")

    got = {
        (r["doc_id"], r["source"])
        for r in sample_domain_cap(d, "source", 3, salt="t1").collect()
    }
    assert got == want

    # partition-layout independence (the two-phase top-cap is distributive)
    got17 = {
        (r["doc_id"], r["source"])
        for r in sample_domain_cap(d.repartition(17), "source", 3, salt="t1").collect()
    }
    assert got17 == want

    # a tiny salt-group fan (forces phase-1 groups of ~1 row) must not
    # change the selection either
    got1 = {
        (r["doc_id"], r["source"])
        for r in sample_domain_cap(d, "source", 3, salt="t1", n_salt=1).collect()
    }
    assert got1 == want


def test_domain_cap_enforces_cap_exactly(spark):
    from pyspark.sql import functions as F

    from debezium_connector_cockroachdb_spark.operators.sampling import sample_domain_cap

    d = spark.read.parquet(f"{SF}/documents.parquet")
    cap = 2
    kept = sample_domain_cap(d, "source", cap, salt="t2")
    per_dom = {r["source"]: r["k"] for r in kept.groupBy("source").agg(F.count("*").alias("k")).collect()}
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per_dom) == {s for s, n in totals.items() if n > 0}
    for s, k in per_dom.items():
        assert k == min(cap, totals[s]), (s, k, totals[s])
