"""Data-quality checks and deterministic sampling — the validation /
subsetting layer of a training-data pipeline (north star: operations
a large-scale data pipeline needs beyond the reference's surface).

Checks are pure aggregates (one pass, map-side combined); sampling is
content-hash-based so the same row always lands in the same split
regardless of partitioning, executor count, or engine — the property
that makes train/eval splits reproducible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_summary(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    range_checks: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One-row violation summary: duplicate count over `unique_cols`,
    null counts per `not_null_cols`, out-of-range counts per
    `range_checks` {col: (lo, hi)}. Single aggregation job."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if unique_cols:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(c) for c in unique_cols])
            ).alias("dup_violations")
        )
    for c in not_null_cols or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    for c, (lo, hi) in (range_checks or {}).items():
        aggs.append(
            F.sum((~F.col(c).between(lo, hi)).cast("long")).alias(f"oob_{c}")
        )
    return df.agg(*aggs)


def hash_split(
    df: DataFrame, key_col: str, buckets: int = 100
) -> Column:
    """Deterministic content-hash bucket in [0, buckets): derived from
    the first 4 hex chars of md5(key) so it is reproducible across
    engines, partitionings and runs (unlike rand()/sampleBy)."""
    nibble = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
    return F.pmod(nibble.cast("long"), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction_pct: int
) -> DataFrame:
    """Keep rows whose hash bucket < fraction_pct (out of 100)."""
    return df.filter(hash_split(df, key_col, 100) < fraction_pct)


def md5_shard(cols: list[Column | str], buckets: int) -> Column:
    """Multi-column form of the hash_split convention: deterministic
    bucket in [0, buckets) from the first 4 hex chars of
    md5(col1 ':' col2 ...) — engine-identical (DuckDB twin:
    ('0x' || substr(md5(k), 1, 4))::BIGINT % buckets). One definition
    for the mini-batch / worker-shard keys so the Spark expression and
    its SQL twins can't drift apart (code-review r13)."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(":"))
        parts.append((F.col(c) if isinstance(c, str) else c).cast("string"))
    nibble = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 4), 16, 10)
    return F.pmod(nibble.cast("long"), F.lit(buckets))


# Gopher (Rae et al. 2021, public) / C4 (Raffel et al. 2020, public)
# named document-quality rules. Thresholds are the published ones where
# applicable; every rule is a pure column expression so the whole suite
# runs inside the scan stage — zero shuffles until the final
# counters aggregation.
GOPHER_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with", "a", "in",
]


def gopher_rule_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document boolean rejection flag per named Gopher/C4 rule.

    Rules (rejection conditions):
      word_count          — not in [50, 100000] words (Gopher)
      mean_word_length    — mean characters/word outside [3, 10] (Gopher)
      symbol_word_ratio   — (#, ellipsis) symbols / words > 0.1 (Gopher)
      bullet_line_ratio   — > 90% of lines start with a bullet (Gopher)
      ellipsis_line_ratio — > 30% of lines end with an ellipsis (Gopher)
      stopword_presence   — fewer than 2 distinct common stopwords (Gopher)
      alpha_word_ratio    — < 80% of words contain a letter (Gopher)
      curly_brace         — contains '{' (C4 code/JS filter)
      lorem_ipsum         — contains 'lorem ipsum' (C4 placeholder filter)

    Every expression is engine-portable arithmetic (length/replace/
    split/list ops exist identically in DuckDB), so the oracle replays
    the SAME rule definitions, not a reimplementation."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    nw = F.size(toks)
    lines = F.split(text, "\n")
    nl = F.size(lines)
    mwl = F.length(F.replace(text, F.lit(" "), F.lit(""))) / nw
    occ = lambda sub: F.length(text) - F.length(  # noqa: E731
        F.replace(text, F.lit(sub), F.lit(""))
    )
    symbol_cnt = occ("#") + occ("...") / 3 + occ("…")
    bullets = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ") | l.startswith("* ") | l.startswith("• "),
        )
    )
    ells = F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    return df.select(
        "*",
        ((nw < 50) | (nw > 100000)).alias("r_word_count"),
        ((mwl < 3) | (mwl > 10)).alias("r_mean_word_length"),
        (symbol_cnt / nw > 0.1).alias("r_symbol_word_ratio"),
        (bullets / nl > 0.9).alias("r_bullet_line_ratio"),
        (ells / nl > 0.3).alias("r_ellipsis_line_ratio"),
        (stop_hits < 2).alias("r_stopword_presence"),
        (alpha / nw < 0.8).alias("r_alpha_word_ratio"),
        F.contains(text, F.lit("{")).alias("r_curly_brace"),
        F.contains(F.lower(text), F.lit("lorem ipsum")).alias("r_lorem_ipsum"),
    )
