"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting.

Design: pure JVM Column expressions (codegen'd, shuffle-free, trivially
scale to 100 TB — they are map-only over the scan). Every operator is
deliberately expressible in ANSI SQL so the DuckDB oracle can verify it
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language — enough signal for an
# n-gram/stopword-ratio language heuristic; counts are exact integer math
# so the SQL oracle reproduces them bit-for-bit
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " das "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " y "],
}


def occurrence_count(text: Column, needle: str) -> Column:
    """# of (possibly overlapping-adjacent) occurrences via length delta."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(len(needle))


def words(text: Column) -> Column:
    """THE whitespace tokenization (shared by every counter in this
    module so they can never disagree on what a word is): split on runs
    of whitespace and drop empty strings — leading/trailing whitespace
    would otherwise contribute phantom '' tokens (``split`` keeps them;
    ``trim`` only strips spaces, not newlines/tabs)."""
    return F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)


def token_count(text: Column) -> Column:
    """Whitespace tokenization count (the cheap n_tok estimator)."""
    return F.size(words(text)).cast("int")


def word_char_ratio(text: Column) -> Column:
    """Share of [a-zA-Z0-9 ] characters — a quality-score component."""
    kept = F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    return F.round(kept / F.greatest(F.length(text), F.lit(1)), 4)


def mean_token_len(text: Column) -> Column:
    t = F.trim(text)
    n = token_count(text)
    letters = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.round(letters / F.greatest(n, F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: word-char ratio damped by
    degenerate token lengths (too-short/too-long average tokens are
    boilerplate/code smells). Deterministic, SQL-oracle-able."""
    mtl = mean_token_len(text)
    len_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(word_char_ratio(text) * len_ok, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((occurrence_count(padded, m) for m in markers), F.lit(0.0)).cast("int")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when no
    marker fires. Ties break by the fixed language order."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lower-cased text — the exact-dedup key that survives formatting noise."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


# GPT-2-style pre-tokenizer, restricted to the lookahead-free ASCII subset
# expressible identically in Java regex (Spark) and RE2 (DuckDB): leading
# contractions, optionally-space-prefixed letter/digit/punctuation runs,
# then bare space runs. Alternation order matters and matches both engines'
# leftmost-first semantics.
BPE_PIECE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"

ROLLING_BASE = 131
ROLLING_MOD = 2_147_483_647  # 2^31-1: (mod-1)*131+255 fits int64 exactly


def bpe_piece_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer pieces (the budget a
    byte-pair tokenizer would start from; whitespace token_count is the
    cheap lower bound)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PIECE_RE), F.lit(0))).cast("int")


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial (Rabin-Karp) rolling hash of the normalized text:
    h = fold(h*B + codepoint) mod 2^31-1 — exact integer math, bit-equal
    in any engine, and extendable to windowed substring fingerprints (the
    rolling property; md5 `fingerprint` cannot roll)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm), F.lit(1))),
        lambda i: F.ascii(norm.substr(i, F.lit(1))),
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(h)


# PII scrubbing (pretraining-corpus hygiene): the three high-volume
# machine-recognizable identifier classes, as lookahead-free ASCII regexes
# that behave identically under Java regex (Spark) and RE2 (DuckDB) —
# leftmost-first, non-overlapping, \b on ASCII word chars. Replacement
# order is load-bearing: emails before URLs (a mailto-style address inside
# a URL is still an address), URLs before IPs (an IP inside an already
# redacted URL must not double-count as a bare IP).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
# URL: non-whitespace run (incl. \r — CRLF text must not lose its
# carriage return into the redaction) whose LAST char is not closing
# punctuation, so '(https://a.example) today' keeps its paren and a
# sentence-final '.' survives. Greedy-class-then-final-class matches
# identically under Java regex and RE2 (both Perl-greedy leftmost-first).
PII_URL_RE = r"https?://[^ \t\n\r]*[^ \t\n\r).,;:!?\]]"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails/URLs/IPv4s with typed placeholders and count each
    replacement actually made (counts are taken on the text as it stands
    at that stage, so an IP living inside a URL counts once, as a URL).
    Map-only JVM regex over the scan — shuffle-free at any corpus size."""
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_urls = F.regexp_count(t1, F.lit(PII_URL_RE))
    t2 = F.regexp_replace(t1, PII_URL_RE, "<URL>")
    n_ips = F.regexp_count(t2, F.lit(PII_IP_RE))
    t3 = F.regexp_replace(t2, PII_IP_RE, "<IP>")
    return df.select(
        F.col(id_col),
        n_emails.cast("int").alias("n_emails"),
        n_urls.cast("int").alias("n_urls"),
        n_ips.cast("int").alias("n_ips"),
        t3.alias("text_redacted"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array = the
    count of the most frequent element — one O(n) fold after the O(n
    log n) sort, vs the O(n²) distinct×filter alternative that hangs an
    executor on a single 500k-token document."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, acc0, step, lambda a: a["best"])


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition/quality counters: characters living in
    duplicated lines, the most-frequent word's count, and the
    most-frequent word-bigram's count — the raw integers behind the
    standard "duplicate line fraction / top n-gram fraction" pretraining
    filters (callers form the ratios; integers stay engine-exact).

    Map-only and doc-local: sort + one fold per counter, O(n log n) in
    the DOCUMENT length (never the corpus), shuffle-free over the scan."""
    t = F.col(text_col)
    w = words(F.lower(t))
    n_words = F.size(w)
    top_word = _max_run(F.array_sort(w))
    # bigrams via 1-based element_at over an index sequence (guarded:
    # Spark's sequence(1, n-1) DESCENDS when n-1 < 1)
    bigrams = F.when(n_words >= 2, F.transform(
        F.sequence(F.lit(1), n_words - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams)
    top_bigram = _max_run(F.array_sort(bigrams))
    # duplicated-line chars: fold sorted lines; a line's chars count once
    # per copy, but only for lines with ≥2 copies (on the run's second
    # element both the first and second copies are charged)
    lines = F.array_sort(F.split(t, "\n"))
    dacc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(1).alias("run"),
        F.lit(0).alias("dup"),
    )

    def dstep(acc, x):
        is_rep = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(is_rep, acc["run"] + 1).otherwise(F.lit(1))
        add = F.when(is_rep & (run == 2), F.length(x) * 2).when(is_rep, F.length(x)).otherwise(F.lit(0))
        return F.struct(x.alias("prev"), run.alias("run"), (acc["dup"] + add).alias("dup"))

    dup_line_chars = F.aggregate(lines, dacc0, dstep, lambda a: a["dup"])
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        top_word.cast("int").alias("top_word_count"),
        n_bigrams.cast("int").alias("n_bigrams"),
        top_bigram.cast("int").alias("top_bigram_count"),
        F.length(t).cast("int").alias("total_chars"),
        dup_line_chars.cast("int").alias("dup_line_chars"),
    )


def analyze_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        word_char_ratio(t).alias("word_char_ratio"),
        mean_token_len(t).alias("mean_token_len"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
