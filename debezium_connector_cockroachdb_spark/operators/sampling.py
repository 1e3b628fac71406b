"""Deterministic stratified sampling for training-corpus curation.

A pretraining data pipeline rebalances its mixture by keeping a different
fraction of each stratum (language, source, quality band). At 10^10 docs
the sample must be (a) a pure map — no shuffle, no count pass, no state;
(b) deterministic and salt-keyed, so a re-run (or a resumed job) keeps
EXACTLY the same rows; (c) composable — two engines sampling the same
table with the same salt agree row-for-row, which also makes the operator
oracle-checkable (unlike ``df.sample``, whose RNG is engine-private).

Mechanism: hash the row id with a salt to a 48-bit integer (md5 prefix —
portable across engines, functions/hashing.py), scale to [0, 1), keep the
row iff u < fraction(stratum). Per-stratum keep rates concentrate tightly
around the requested fractions (binomial over independent uniforms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_48

UNIT_DENOM = float(1 << 48)


def unit_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): md5-48 of (id || salt) / 2^48.
    Exact on any engine that renders the same md5 hex (48-bit ints are
    exact in float64)."""
    return (
        md5_48(F.concat(id_col.cast("string"), F.lit(salt))).cast("double")
        / F.lit(UNIT_DENOM)
    )


def sample_domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "",
    n_salt: int = 64,
) -> DataFrame:
    """Quota sampling: keep at most ``cap`` rows per domain (source, site,
    crawl host, …), selected deterministically — the rows whose salted
    48-bit hash ranks lowest within the domain, ties by id. A pretraining
    mixture uses this to stop a single giant domain from dominating the
    corpus while keeping the selection reproducible across runs/engines.

    Skew is the whole problem at 10^10 docs: one domain can hold 10^8 rows,
    so a ``row_number() OVER (PARTITION BY domain)`` window — which sorts
    every row of the hot domain on one reducer — is dead on arrival.
    Instead top-``cap`` (a distributive aggregate, like the ANN top-k in
    similarity.py) runs in two bounded phases:

    1. groupBy(domain, salt-of-id % n_salt): each of the ``n_salt`` salt
       groups of a domain reduces to its own top-``cap`` — the hot
       domain's rows spread over ``n_salt`` uniform keys, so no single
       reducer sees more than ~1/n_salt of a domain. (The collect_list
       buffer within one salt group holds that group's rows before the
       sort+slice — the salt split bounds it n_salt-fold, not at ``cap``;
       a genuinely cap-bounded partial aggregate would need a custom
       Aggregator.)
    2. groupBy(domain) over the ≤ n_salt·cap survivors: the final
       top-``cap`` sees ``n_salt × cap`` rows per domain, independent of
       domain size.

    Only (hash, id) pairs travel through the shuffles; payload columns are
    joined back by id afterwards if the caller needs them. Output:
    (id, domain) of the kept rows.
    """
    h = md5_48(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    packed = F.struct(h.alias("h"), F.col(id_col).alias("_id"))
    local = (
        df.select(F.col(domain_col).alias("_dom"), packed.alias("_p"))
        .groupBy("_dom", F.pmod(F.xxhash64(F.col("_p._id").cast("string")), F.lit(n_salt)).alias("_sg"))
        .agg(F.slice(F.sort_array(F.collect_list("_p")), 1, cap).alias("_top"))
        .select("_dom", F.explode("_top").alias("_p"))
    )
    return (
        local.groupBy("_dom")
        .agg(F.slice(F.sort_array(F.collect_list("_p")), 1, cap).alias("_top"))
        .select("_dom", F.explode("_top").alias("_p"))
        .select(F.col("_p._id").alias(id_col), F.col("_dom").alias(domain_col))
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``fractions[s]``
    (``default_fraction`` for unlisted strata), deterministically in
    (id, salt). Pure map-filter over the scan — no shuffle, no count
    pass, and the decision for a row never changes across runs,
    partitions, or engines (the hash filter itself evaluates post-scan;
    column pruning still reaches the reader)."""
    u = unit_uniform(F.col(id_col), salt)
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)
