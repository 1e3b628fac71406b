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
