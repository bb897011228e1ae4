"""Text analysis over the ``documents`` table: tokenization, quality
scoring, language ID, fingerprinting.

Determinism contract (shared with the DuckDB oracles): tokens are the
single-space split of ``text`` (the corpus is single-space separated — a
general engine would regex-split, which is a one-line swap); every score
is a ratio of integer counts, so Spark and the oracle produce bit-identical
doubles; every hash is lowercase-hex md5, identical in both engines.

Scale posture: all of these are row-local column expressions (no shuffle,
no UDF, whole-stage codegen) — they stream through a 100 TB corpus at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language-ID.
#: Deliberately short — the point is the operator shape (argmax of
#: per-language evidence counts), not lexicon quality.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ein"),
    "en": ("the", "a", "is", "of", "and"),
    "es": ("el", "los", "las", "y", "una"),
    "fr": ("le", "la", "les", "et", "une"),
    "zh": ("的", "是", "了", "在", "和"),
}

#: Flat stopword set used by the quality score.
ALL_STOPWORDS: tuple[str, ...] = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


def tokens(text: Column) -> Column:
    """Token array: single-space split (see module determinism contract)."""
    return F.split(text, " ")


def _count_in(arr: Column, words: tuple[str, ...]) -> Column:
    """Occurrences (with duplicates) of any of ``words`` in ``arr`` —
    row-local higher-order filter, no explode."""
    return F.size(F.filter(arr, lambda w: w.isin(*words)))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics + a composite quality score.

    Columns added:
      n_tokens        — token count (BIGINT)
      n_distinct      — distinct token count
      mean_token_len  — (chars - spaces) / tokens, DOUBLE
      stopword_ratio  — stopword occurrences / tokens
      distinct_ratio  — distinct / total tokens (1 - duplication)
      quality_score   — 0.5·stopword_ratio + 0.5·distinct_ratio
    """
    w = tokens(F.col(text_col))
    n = F.size(w).cast("bigint")
    nd = F.size(F.array_distinct(w)).cast("bigint")
    stop_hits = _count_in(w, ALL_STOPWORDS).cast("bigint")
    mean_len = (F.length(F.col(text_col)).cast("bigint") - (n - 1)).cast("double") / n.cast(
        "double"
    )
    stop_ratio = stop_hits.cast("double") / n.cast("double")
    distinct_ratio = nd.cast("double") / n.cast("double")
    return (
        docs.withColumn("n_tokens", n)
        .withColumn("n_distinct", nd)
        .withColumn("mean_token_len", mean_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn(
            "quality_score", F.lit(0.5) * stop_ratio + F.lit(0.5) * distinct_ratio
        )
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword evidence.

    Adds ``lang_pred`` (ISO code or ``und`` when no list scores > 0) and
    ``lang_score`` (the winning evidence count). Ties break on language
    code ascending — a deterministic total order shared with the oracle.
    """
    w = tokens(F.col(text_col))
    scored = docs
    for lang, words in STOPWORDS.items():
        scored = scored.withColumn(f"_score_{lang}", _count_in(w, words).cast("bigint"))
    best = F.greatest(*[F.col(f"_score_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    # reversed: earlier (ascending) language wins ties via later when-override
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (F.col(f"_score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = scored.withColumn("lang_pred", pred).withColumn("lang_score", best)
    return out.drop(*[f"_score_{lang}" for lang in STOPWORDS])


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; documents shorter than ``n`` tokens fall back
    to a single whole-text shingle (both engines agree on the edge)."""
    w = tokens(text)
    size = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), size - F.lit(n - 1)),
        lambda j: F.concat_ws(
            " ", *[F.element_at(w, j + i) for i in range(n)]
        ),
    )
    return F.when(size >= n, grams).otherwise(F.array(text))


def minhash_signature(sh: Column, k: int = 12) -> Column:
    """MinHash signature: array of k lowercase-hex md5 minima.

    Hash family i is ``md5('{i}:' || shingle)`` — string-valued, so the
    min is a lexicographic min that both engines order identically (no
    64-bit integer-parsing portability trap). Row-local, no shuffle.
    """

    def salted_min(i: int) -> Column:
        prefix = f"{i}:"
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s))))

    return F.array(*[salted_min(i) for i in range(k)])


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 12) -> DataFrame:
    """Document fingerprints: exact-hash + MinHash sketch.

    Adds ``fp_md5`` (exact content hash) and ``minhash`` (k-element
    signature). The signature approximates shingle-set Jaccard:
    ``P[mh_i(a) = mh_i(b)] = J(a, b)``.
    """
    sh = shingles(F.col(text_col))
    return docs.withColumn("fp_md5", F.md5(F.col(text_col))).withColumn(
        "minhash", minhash_signature(sh, k)
    )
