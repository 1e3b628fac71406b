"""Token-native corpus operators over ``array<int>`` token sequences —
the payload the CDC engine actually ships (the north-rule table is
(doc_id, tokens:array<int32>, n_tok, source); see sources/lake.py).

The text-space suite (text_dedup.py) dedups and decontaminates on
characters; a tokenized pipeline needs the same hygiene in TOKEN space,
where "the  Quick brown" and "the quick brown" may already be the same
id sequence and where eval-set leakage is measured in token n-grams
(the standard contamination definition for pretraining corpora). All
arithmetic here is exact int64 — hashes are md5-48 (portable, see
functions/hashing.py) and rolling polynomial folds mod 2^31-1, so every
operator replays bit-for-bit in the DuckDB oracle and across engines.

Scale shapes (the 100 TB story):

* tokenize / fingerprint / n-gram-ids — pure map over the scan: JVM
  higher-order functions (split → transform → aggregate), no UDF, no
  shuffle, plan width independent of sequence length.
* token exact dedup — one hash-groupBy on the 8-byte fingerprint with
  map-side combine (same shape as text_dedup.exact: nothing pairwise).
* token n-gram decontamination — the eval side collapses to its distinct
  n-gram ids and BROADCASTS; the corpus side is a map-side join over the
  scan and a per-doc partial aggregation — the only shuffle carries one
  narrow row per document (same shape as benchmark_contamination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_48

# fold modulus/base: P < 2^31 keeps acc*B + t < 2^39 — exact in int64 on
# every engine (no overflow even under ANSI/strict modes)
NGRAM_P = 2147483647
NGRAM_B = 131
FP_SEED = 7


def hashed_tokens(text: Column, vocab_size: int = 32768) -> Column:
    """Deterministic whitespace tokenizer → hashed ids: normalize
    (lower/trim/collapse whitespace), split, md5-48 each token mod
    ``vocab_size``. A stand-in for a real BPE vocabulary that any engine
    reproduces exactly — the downstream operators only need ids."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    words = F.filter(F.split(norm, " "), lambda w: w != F.lit(""))
    return F.transform(words, lambda w: md5_48(w) % vocab_size)


def token_fingerprint(tokens: Column) -> Column:
    """Order-sensitive exact fingerprint of a token sequence: seeded
    polynomial fold (… (seed·B + t0) mod P … ). Two sequences collide only
    on a P-rare hash collision; permutations/truncations diverge (unlike
    a sum or xor). Empty/degenerate sequences fold to the seed."""
    return F.aggregate(
        tokens.cast("array<long>"),
        F.lit(FP_SEED).cast("long"),
        lambda acc, t: (acc * NGRAM_B + t) % NGRAM_P,
    )


def dedup_exact_tokens(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups in token space: one row per fingerprint with
    the keeper (min id) and the group size — one map-side-combinable
    hash-groupBy, nothing pairwise (text_dedup.exact_duplicates, but on
    the id sequence the trainer actually consumes)."""
    return (
        df.select(F.col(id_col), token_fingerprint(F.col(tokens_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def token_ngram_ids(tokens: Column, n: int = 3) -> Column:
    """Distinct rolling-hash ids of the sequence's token n-grams: window
    i folds its n tokens with the same (B, P) polynomial. Sequences
    shorter than ``n`` yield an empty array (guarded — Spark's
    ``sequence(1, 0)`` would count DOWN, not return empty)."""
    t = tokens.cast("array<long>")
    size = F.size(t)

    def gram(i: Column) -> Column:
        h = F.element_at(t, i.cast("int"))
        for j in range(1, n):
            h = (h * NGRAM_B + F.element_at(t, (i + j).cast("int"))) % NGRAM_P
        return h

    return (
        F.when(t.isNull(), F.lit(None).cast("array<long>"))
        .when(size >= n, F.array_distinct(F.transform(F.sequence(F.lit(1), size - (n - 1)), gram)))
        .otherwise(F.array().cast("array<long>"))
    )


def token_ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    vocab_size: int = 32768,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    corpus_tokens_col: str | None = None,
    bench_tokens_col: str | None = None,
) -> DataFrame:
    """Token-space benchmark decontamination: per corpus document, how
    many of its distinct token n-grams appear anywhere in the benchmark
    corpus — (doc_id, n_ngrams, n_contaminated). Documents shorter than
    ``n`` tokens carry no n-grams and emit no row (nothing to leak).
    Pass ``*_tokens_col`` to run on existing token-array columns (the CDC
    state table); otherwise text is tokenized with ``hashed_tokens``.

    Scale shape: identical to text_dedup.benchmark_contamination — the
    eval set collapses to distinct n-gram ids and broadcasts; the corpus
    side is a map-side join over the scan, the per-doc aggregation
    collapses map-side, and the only shuffle moves #docs narrow rows."""
    # materialize the token array in its own projection BEFORE windowing:
    # token_ngram_ids indexes its input once per window position, and
    # inside an interpreted higher-order function that re-evaluates the
    # whole child expression — handing it the raw tokenizer tree re-runs
    # the per-token md5 for every element_at (measured: 72 s vs 1 s at
    # sf0.1). A plain column reference is O(1) per index.
    def with_toks(df: DataFrame, text_c: str, tok_c: str | None) -> DataFrame:
        t = F.col(tok_c) if tok_c else hashed_tokens(F.col(text_c), vocab_size)
        return df.select(*df.columns, t.alias("_toks"))

    bench_ids = (
        with_toks(benchmark, bench_text_col, bench_tokens_col)
        .select(F.explode(token_ngram_ids(F.col("_toks"), n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams = with_toks(corpus, text_col, corpus_tokens_col).select(
        F.col(id_col),
        F.explode(token_ngram_ids(F.col("_toks"), n)).alias("gram"),
    )
    return (
        grams.join(F.broadcast(bench_ids), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias("n_contaminated"),
        )
    )
