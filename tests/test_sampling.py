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
