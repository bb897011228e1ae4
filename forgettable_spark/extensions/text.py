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

#: THE quality-gate thresholds (length + lexical diversity), defined
#: once: quality_filter, corpus_report, source_curation, and the
#: distilled classifier's labeling step all gate on the same rule, and
#: their DuckDB oracles interpolate these same values — a tuning change
#: lands everywhere or nowhere.
QUALITY_MIN_TOKENS = 20
QUALITY_MIN_DISTINCT_RATIO = 0.35


def quality_pass(t: Column, min_tokens: int = QUALITY_MIN_TOKENS,
                 min_distinct_ratio: float = QUALITY_MIN_DISTINCT_RATIO) -> Column:
    """NULL-safe quality-gate flag (1/0 INT): non-NULL text with at
    least ``min_tokens`` whitespace tokens and distinct-token ratio at
    least ``min_distinct_ratio``. The single Column encoding of the rule
    every quality-family operator shares; SQL twin:
    :func:`quality_pass_sql`."""
    w = tokens(t)
    n = F.size(w).cast("bigint")
    nd = F.size(F.array_distinct(w)).cast("bigint")
    return (
        F.when(
            t.isNotNull()
            & (n >= min_tokens)
            & (nd.cast("double") / n.cast("double") >= F.lit(min_distinct_ratio)),
            1,
        )
        .otherwise(0)
    )


def quality_pass_sql(text_expr: str = "text",
                     min_tokens: int = QUALITY_MIN_TOKENS,
                     min_distinct_ratio: float = QUALITY_MIN_DISTINCT_RATIO) -> str:
    """DuckDB fragment twin of :func:`quality_pass` (evaluates to 1/0)."""
    return (
        f"CASE WHEN {text_expr} IS NOT NULL"
        f" AND len(string_split({text_expr}, ' ')) >= {min_tokens}"
        f" AND CAST(len(list_distinct(string_split({text_expr}, ' '))) AS DOUBLE)"
        f" / CAST(len(string_split({text_expr}, ' ')) AS DOUBLE) >= {min_distinct_ratio!r}"
        f" THEN 1 ELSE 0 END"
    )


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


#: BPE-ish pre-tokenization: alphanumeric runs OR single non-space
#: symbols — the GPT-2-style first pass that turns "it's 4.2!" into
#: [it, ', s, 4, ., 2, !]. Simple character classes only, so Java regex
#: (Spark) and DuckDB's engine count identically (asserted in tests).
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts under both counting conventions:

      n_tokens_ws   — whitespace tokens (the engine's split contract)
      n_tokens_bpe  — BPE-ish subword-ish units (:data:`BPE_ISH_PATTERN`)
      bpe_per_ws    — their ratio, a cheap proxy for *tokenizer cost* of
                      a document (symbol-heavy text expands under BPE)

    Row-local codegen expressions (split / regexp_count) — zero shuffle,
    computed in the scan stage at any corpus size.
    """
    ws = F.size(tokens(F.col(text_col))).cast("bigint")
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("bigint")
    return docs.select(
        "doc_id",
        ws.alias("n_tokens_ws"),
        bpe.alias("n_tokens_bpe"),
        (bpe.cast("double") / ws.cast("double")).alias("bpe_per_ws"),
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
    to a single whole-text shingle (both engines agree on the edge).

    Construction is a chain of ``zip_with`` concats over shifted slices
    of the token array rather than ``transform(sequence(...))`` with
    per-gram ``element_at`` — measured **6.6× faster** at sf0.1
    (0.56 s vs 3.7 s for the explode+count of the whole corpus): each
    token is visited once per shift instead of n random accesses per
    gram through an interpreted lambda. ``zip_with`` pads the shorter
    side with NULL (concat → NULL), so the final slice cuts the array
    back to the ``size - n + 1`` valid grams. Output is bit-identical to
    the old form (asserted over the full corpus and the short-doc
    edges), so every shingle-consuming oracle is unaffected.
    """
    return shingles_from_tokens(tokens(text), text, n)


def shingles_from_tokens(w: Column, text: Column, n: int = 3) -> Column:
    """:func:`shingles` from an ALREADY-TOKENIZED array ``w`` (which must
    be ``tokens(text)`` of the same row — the raw ``text`` is still
    needed for the short-document whole-text fallback). This is the
    shared-scan entry: a caller holding a materialized token projection
    (the combined spine build, the admission loop's checkpointed base)
    derives shingles without re-splitting the text, and the expression
    tree below is the exact one :func:`shingles` builds, so the output
    is bit-identical by construction."""
    size = F.size(w)
    g = w
    for i in range(1, n):
        g = F.zip_with(
            g,
            F.slice(w, i + 1, F.greatest(size - i, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    g = F.slice(g, 1, F.greatest(size - F.lit(n - 1), F.lit(0)))
    return F.when(size >= n, g).otherwise(F.array(text))


#: Mersenne prime 2^31 - 1: the affine family's modulus. Keeping hashes
#: below 2^31 guarantees a_i * h + b_i < 2^62 — exact in BIGINT on both
#: engines, no overflow, no float.
MINHASH_P = 2_147_483_647

#: Fixed affine-family coefficients (a_i, b_i), a_i odd, hardcoded so the
#: SQL oracle can restate them literally.
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_203_114_875, 602_101_883),
    (972_873_481, 1_557_013_215),
    (431_541_409, 55_596_931),
    (1_823_987_653, 907_557_101),
    (263_937_119, 1_341_744_287),
    (1_549_221_977, 419_880_041),
    (711_023_519, 1_939_235_467),
    (1_097_374_747, 250_374_031),
    (2_009_111_683, 1_112_484_871),
    (156_668_843, 1_753_862_507),
    (888_888_889, 333_333_331),
    (1_666_666_669, 777_777_779),
)


def shingle_hash(s: Column) -> Column:
    """Base 31-bit shingle hash: first 15 hex chars of md5 (60 bits) mod
    2^31-1. One md5 per shingle; the k-family derives from this single
    pass. Oracle twin: ``('0x' || substr(md5(s),1,15))::BIGINT % p``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % F.lit(MINHASH_P)


def minhash_signature(sh: Column, k: int = 12) -> Column:
    """MinHash signature: array of k BIGINT minima over the affine hash
    family ``h_i(x) = (a_i·x + b_i) mod (2^31-1)`` applied to one shared
    base hash per shingle.

    One md5 per shingle total (the old per-salt-md5 variant cost k md5
    passes — 12× the hashing for identical sketch quality). Row-local,
    no shuffle; all arithmetic exact in int64 on both engines.
    """
    return minhash_signature_from_base(F.transform(sh, shingle_hash), k)


def minhash_signature_from_base(base: Column, k: int = 12) -> Column:
    """Signature from a base-hash array, as ONE fold.

    All k family minima are accumulated in a single ``aggregate`` pass
    whose accumulator is the k-vector of running minima. This matters
    beyond elegance: with k separate ``array_min(transform(base, ...))``
    expressions, Catalyst's projection collapse re-inlines the ``base``
    expression k times, and higher-order functions sit outside codegen's
    common-subexpression elimination — so the md5 under ``base`` would run
    k times per shingle. A single fold references ``base`` exactly once.
    """
    if k > len(MINHASH_COEFFS):
        raise ValueError(f"k={k} exceeds {len(MINHASH_COEFFS)} fixed coefficient pairs")
    init = F.array(*[F.lit(MINHASH_P).cast("bigint") for _ in range(k)])

    def merge(acc: Column, h: Column) -> Column:
        return F.array(
            *[
                F.least(
                    F.element_at(acc, i + 1),
                    (F.lit(MINHASH_COEFFS[i][0]) * h + F.lit(MINHASH_COEFFS[i][1]))
                    % F.lit(MINHASH_P),
                )
                for i in range(k)
            ]
        )

    return F.aggregate(base, init, merge)


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 12) -> DataFrame:
    """Document fingerprints: exact-hash + MinHash sketch.

    Adds ``fp_md5`` (exact content hash) and ``minhash`` (k-element BIGINT
    signature). The signature approximates shingle-set Jaccard:
    ``P[mh_i(a) = mh_i(b)] = J(a, b)``. The base-hash array is
    materialized once, so the whole sketch costs one md5 per shingle.
    """
    base = F.transform(shingles(F.col(text_col)), shingle_hash)
    return (
        docs.withColumn("fp_md5", F.md5(F.col(text_col)))
        .withColumn("_mh_base", base)
        .withColumn("minhash", minhash_signature_from_base(F.col("_mh_base"), k))
        .drop("_mh_base")
    )


#: PII patterns, deliberately restricted to character classes + bounded
#: quantifiers so Java regex (Spark) and RE2 (DuckDB) match identically.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^ ]+"


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII detection + redaction fingerprint.

    Columns: ``n_emails``, ``n_urls`` (non-overlapping match counts) and
    ``redacted_md5`` — the hash of the text after replacing every email
    with ``<EMAIL>`` and every URL with ``<URL>``, which lets a test (or
    oracle) verify the *entire redacted corpus* byte-for-byte without
    shipping the text back.

    Row-local regexp expressions — scan-stage codegen, zero shuffle, the
    same shape at 100 TB. Redaction order is emails first, then URLs.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), URL_PATTERN, "<URL>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(URL_PATTERN)).cast("bigint").alias("n_urls"),
        F.md5(redacted).alias("redacted_md5"),
    )


def top_ngrams(docs: DataFrame, text_col: str = "text", n: int = 3, k: int = 20) -> DataFrame:
    """Corpus-wide n-gram frequency: the ``k`` most frequent word
    n-grams with counts (duplicates counted, ties broken ascending by
    gram for a deterministic total order).

    Plan shape: explode -> partial count (map-side combine) -> one
    shuffle keyed by gram -> ``TakeOrderedAndProject`` top-k. The only
    full-width shuffle rows are (gram, partial_count) pairs; at corpus
    scale the partial aggregation collapses each executor's grams before
    anything moves.
    """
    return (
        docs.filter(F.col(text_col).isNotNull())  # NULL text has no grams
        .select(F.explode(shingles(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(k)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals — the Gopher/RefinedWeb rule
    family for catching boilerplate, keyword stuffing, and generation
    loops that per-corpus dedup cannot see (the repetition is INSIDE one
    document). Returns (doc_id, n_bigrams, top_bigram_frac,
    dup_bigram_frac):

    - ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over all bigram occurrences (stuck-phrase detector);
    - ``dup_bigram_frac`` — fraction of bigram occurrences that are
      repeats of an earlier one, i.e. ``1 − distinct/total`` (overall
      redundancy).

    Plan shape: explode bigrams → per-(doc, gram) count (map-side
    partial collapses each doc's grams inside the scan stage) → per-doc
    rollup — the same codegen-friendly explode+aggregate shape as the
    SimHash sketch, shuffling counts rather than text. Fractions are
    integer-over-integer casts, so both engines produce identical
    doubles. Documents shorter than 2 tokens inherit the
    :func:`shingles` whole-text fallback (one gram → fracs 1.0 / 0.0);
    NULL text yields no row, matching the oracle's ``unnest``.
    """
    per = (
        docs.select(F.col(id_col), F.explode(shingles(F.col(text_col), n=2)).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = per.groupBy(id_col).agg(
        F.sum("_c").alias("n_bigrams"),
        F.max("_c").alias("_top"),
        F.count(F.lit(1)).alias("_distinct"),
    )
    n = F.col("n_bigrams").cast("double")
    return agg.select(
        F.col(id_col),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        (F.col("_top").cast("double") / n).alias("top_bigram_frac"),
        ((F.col("n_bigrams") - F.col("_distinct")).cast("double") / n).alias(
            "dup_bigram_frac"
        ),
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = QUALITY_MIN_TOKENS,
    min_distinct_ratio: float = QUALITY_MIN_DISTINCT_RATIO,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Quality keep-list: documents passing the composite thresholds,
    with their scores. The standard pre-training filter pass (length +
    lexical-diversity + stopword-evidence gates) as one row-local
    predicate over :func:`with_text_stats` — computed in the scan stage,
    zero shuffle, and Catalyst collapses the stats projection into the
    filter so rejected rows never leave the scan."""
    stats = with_text_stats(docs, text_col)
    return stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select("doc_id", "n_tokens", "distinct_ratio", "stopword_ratio", "quality_score")


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = QUALITY_MIN_TOKENS,
    min_distinct_ratio: float = QUALITY_MIN_DISTINCT_RATIO,
) -> DataFrame:
    """One-row dataset card: the corpus-level numbers an operator reads
    before and after a pipeline run (ingest sanity, filter impact,
    duplication level) without assembling six queries by hand.

    Columns — all exact integers, so the row is hash-stable across
    engines and partitionings (a mean of DOUBLEs would sum in partition
    order and break bit parity):

      n_docs, n_null_text, n_langs, total_chars, total_tokens,
      n_pass_quality   — documents passing the default quality gate
                         (:func:`quality_filter` thresholds),
      n_dup_docs       — documents whose exact content hash appears
                         more than once,
      n_dup_groups     — distinct duplicated contents.

    Two aggregations (corpus scan + md5 group sizes) joined as one-row
    frames; both have map-side partials, so the shuffles carry one row
    per partition and per distinct hash respectively.
    """
    t = F.col(text_col)
    w = tokens(t)
    n = F.size(w).cast("bigint")
    nd = F.size(F.array_distinct(w)).cast("bigint")
    base = docs.select(
        t.alias("_t"),
        F.col("lang"),
        F.col("n_chars"),
        F.when(t.isNotNull(), n).alias("_n_tok"),
        quality_pass(t, min_tokens, min_distinct_ratio).alias("_pass"),
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("_t").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_text"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("_n_tok").cast("bigint").alias("total_tokens"),
        F.sum("_pass").cast("bigint").alias("n_pass_quality"),
    )
    # coalesce(0): on a corpus with zero non-null-text docs the grouped
    # frame is empty and SUM returns NULL — the oracle's COALESCE(...,0)
    # and this must agree for the card to hash-match on exactly the
    # ingest-failure corpus it exists to diagnose.
    dups = (
        docs.filter(t.isNotNull())
        .groupBy(F.md5(t).alias("_h"))
        .count()
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_dup_docs"),
            F.coalesce(
                F.sum(F.when(F.col("count") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_dup_groups"),
        )
    )
    return base.crossJoin(dups)


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    top_j: int = 3,
    spine: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Top-``top_j`` keywords per document by tf·idf.

    Scoring uses the raw inverse-document-frequency *ratio*
    ``score = tf · N / df`` rather than a logarithm: ``tf·N`` is exact in
    int64 and the single float division is IEEE-identical across
    engines, so the result hash-matches a SQL oracle (libm ``ln`` is
    only 1-ulp-reproducible, which is not good enough for bit parity;
    the ranking is the same either way since ln is monotone).

    Plan shape: one explode + (doc, token) count (map-side partial), a
    token-level df aggregation of the *distinct* doc-token pairs (reuses
    the first aggregation's output — no second scan), a broadcast-sized
    join on token, and one per-doc window for the top-j. Ties break
    (score desc, token asc). With a prebuilt ``spine``
    (:mod:`forgettable_spark.extensions.postings`) the explode is
    skipped entirely — pairs come from the fixed-width postings table;
    ``n_docs`` still counts ALL documents (including NULL text), per
    the scoring contract.
    """
    from pyspark.sql import Window

    n_docs = docs.count()  # scalar, folded into the score expression
    if spine is not None:
        pairs = spine["postings"].select(
            "doc_id", F.col("term").alias("token"), "tf"
        )
    else:
        pairs = (
            docs.filter(F.col(text_col).isNotNull())
            .select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    df_counts = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = pairs.join(df_counts, "token").withColumn(
        "score",
        (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df").cast("double"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_j)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


def source_curation(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = QUALITY_MIN_TOKENS,
    min_distinct_ratio: float = QUALITY_MIN_DISTINCT_RATIO,
    min_pass_rate: float = 0.5,
    max_dup_rate: float = 0.2,
    min_docs: int = 10,
    persist: bool = True,
) -> DataFrame:
    """Source-level curation verdicts: the pruning decision real
    pipelines make ABOVE the document level (drop a crawl source whose
    documents mostly fail quality or mostly duplicate the rest of the
    corpus — aggregator and mirror domains), one row per ``source``:

      n_docs, n_null_text, n_pass_quality, n_dup_docs — exact integers;
      pass_rate, dup_rate — each one integer/integer division
        (rates over the source's NON-NULL documents);
      keep — the verdict: pass_rate >= min_pass_rate AND dup_rate <=
        max_dup_rate AND n_docs >= min_docs. Sources below ``min_docs``
        are dropped as unjudgeable rather than given the benefit of the
        doubt (tiny samples pass thresholds by luck).

    Duplication is judged CORPUS-WIDE (a doc counts as dup if its
    content hash appears more than once anywhere, not just within its
    source) — that is exactly the mirror-site signal a within-source
    count would miss.

    Plan shape: one scan computes the per-doc quality predicate and
    content hash row-locally (the projection is scope-cached behind
    ``persist`` — the group-size aggregation and the join-back both
    consume it, and an uncached plan would scan the corpus twice);
    hash-group sizes come from one hash-keyed aggregation joined back
    (fixed-width keys) — NULL-text rows BYPASS that join entirely (a
    NULL hash can never be a dup, and routing every NULL row through
    one NULL join key would funnel an ingest-failure corpus into a
    single shuffle partition — the skew shape :func:`exact_dedup`'s
    group key also avoids); the final per-source rollup is a tiny
    aggregation. Rates divide exact BIGINTs, so rows hash identically
    across engines and partitionings.
    """
    from forgettable_spark.functions.cache import scoped_cache

    t = F.col(text_col)
    base = docs.select(
        F.col("source"),
        t.isNull().cast("int").alias("_null"),
        quality_pass(t, min_tokens, min_distinct_ratio).alias("_pass"),
        F.md5(t).alias("_h"),
    )
    if persist:
        base = scoped_cache(base)
    nn = base.filter(F.col("_h").isNotNull())
    sizes = nn.groupBy("_h").agg(F.count(F.lit(1)).alias("_hn"))
    joined = nn.join(sizes, "_h").unionByName(
        base.filter(F.col("_h").isNull()).withColumn(
            "_hn", F.lit(None).cast("bigint")
        )
    )
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_null").cast("bigint").alias("n_null_text"),
        F.sum("_pass").cast("bigint").alias("n_pass_quality"),
        F.sum(F.when(F.col("_hn") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_docs"),
    )
    # An all-NULL-text source has zero live docs: rates pin to 0.0 (and
    # keep to false via min_docs/pass_rate) instead of NULL/NaN, which
    # would round-trip differently through engine dataframe bridges.
    live = (F.col("n_docs") - F.col("n_null_text")).cast("double")
    pass_rate = F.when(
        live > 0, F.col("n_pass_quality").cast("double") / live
    ).otherwise(F.lit(0.0))
    dup_rate = F.when(
        live > 0, F.col("n_dup_docs").cast("double") / live
    ).otherwise(F.lit(0.0))
    return agg.select(
        "source",
        "n_docs",
        "n_null_text",
        "n_pass_quality",
        "n_dup_docs",
        pass_rate.alias("pass_rate"),
        dup_rate.alias("dup_rate"),
        (
            (pass_rate >= F.lit(min_pass_rate))
            & (dup_rate <= F.lit(max_dup_rate))
            & (F.col("n_docs") >= F.lit(min_docs))
        ).alias("keep"),
    )


def vocabulary_novelty(
    existing: DataFrame, batch: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distribution-shift monitor for ingest: how much of an incoming
    slice's vocabulary is NEW versus the already-held corpus — the
    observability twin of admission dedup (dedup answers "is this
    document a repeat?", this answers "is this slice adding language we
    have never seen, or more of the same?"). One row:

      n_batch_types,  n_new_types,  new_type_rate   — distinct tokens;
      n_batch_tokens, n_new_tokens, new_token_rate  — occurrences.

    A crawl slice full of novel types is either a new domain (good) or
    encoding garbage (bad) — either way the number that pages someone;
    near-zero novelty means the pipeline is paying to re-ingest its own
    tail. All counts exact integers (rates are single divisions), so
    the row hash-matches cross-engine.

    Plan shape: one explode + (token, tf) aggregation per side, a
    left-anti join of batch types against existing types (fixed-width
    token keys), and two one-row rollups. Nothing retains text; the
    existing side's type table is the reusable artifact a production
    loop would maintain incrementally (same pattern as the admission
    sketch index).
    """
    bt = (
        batch.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    et = (
        existing.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .distinct()
    )
    new = bt.join(et, "token", "left_anti")
    # COALESCE the SUMs (NULL over an empty frame), and pin the rates to
    # 0.0 when the batch slice holds no text at all — an ingest outage
    # is exactly the input a monitor must report on, not crash on
    # (under ANSI mode an unguarded 0-denominator division THROWS).
    totals = bt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch_types"),
        F.coalesce(F.sum("tf"), F.lit(0)).cast("bigint").alias("n_batch_tokens"),
    )
    news = new.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_types"),
        F.coalesce(F.sum("tf"), F.lit(0)).cast("bigint").alias("n_new_tokens"),
    )

    def rate(num: str, den: str):
        return F.when(
            F.col(den) > 0, F.col(num).cast("double") / F.col(den).cast("double")
        ).otherwise(F.lit(0.0))

    return totals.crossJoin(news).select(
        "n_batch_types",
        "n_new_types",
        rate("n_new_types", "n_batch_types").alias("new_type_rate"),
        "n_batch_tokens",
        "n_new_tokens",
        rate("n_new_tokens", "n_batch_tokens").alias("new_token_rate"),
    )
