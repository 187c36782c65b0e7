"""Text-analysis column expressions (SURVEY.md §2.J J6-J8): tokenize,
shingle, quality ratios, language heuristic, rolling-hash fingerprint.
All built-in array/string functions — the hot path stays JVM-side; at
100 TB these run inside the scan stage with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram language heuristic. Deliberately
# minimal: the operator contract is "deterministic, cheap, SQL-expressible",
# not linguistic accuracy (swap in fasttext via mapInPandas for that).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (fixture text is space-separated words)."""
    return F.split(text if isinstance(text, str) else text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    return F.length(text if isinstance(text, str) else text)


def shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-word shingles of a token array: slice a sliding window and
    re-join with spaces. Empty array when the doc has < n tokens
    (guarded explicitly: Spark's sequence(1, 0) counts DOWN)."""
    count = F.size(toks) - (n - 1)
    out = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(out) if distinct else out


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang` — a quality signal."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id_heuristic(toks: Column) -> Column:
    """Pick the language whose stopword list overlaps the most tokens;
    'und' (undetermined) when nothing matches. Deterministic tie-break
    by language code order of STOPWORDS keys."""
    expr: Column = F.lit("und")
    best: Column = F.lit(0)

    def _hits(words: list[str]) -> Column:
        # closure (not a default arg): Spark inspects lambda arity, and a
        # second parameter would be bound to the element index
        stop = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))

    # Build nested CASE: later langs win only with strictly more hits,
    # so earlier keys win ties.
    hit_cols = {lang: _hits(ws) for lang, ws in STOPWORDS.items()}
    for lang, hits in hit_cols.items():
        expr = F.when(hits > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(hits, best)
    return expr


def doc_fingerprint(toks: Column) -> Column:
    """Order-sensitive rolling-hash document fingerprint:
    Σ i·(31·ascii(first char of tokᵢ) + len(tokᵢ)) over 1-based i.
    Cheap, deterministic, cross-engine (ascii/length/arithmetic only)."""
    return F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, i: i.cast("long")
            * (F.ascii(F.substring(t, 1, 1)).cast("long") * 31 + F.length(t).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
