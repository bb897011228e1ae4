"""Corpus language-model scoring: a bigram LM trained on the corpus,
scoring every document's fluency under it.

The classic quality filter a pre-training pipeline runs after the
rule-based gates (CCNet, RefinedWeb, Gopher all do a variant): train a
cheap n-gram LM on the corpus (or a trusted reference corpus), score
each document, and cut the tail — documents whose token transitions the
model finds improbable are boilerplate, mangled extractions, or noise.

Model and score (shared bit-for-bit with the DuckDB oracle):

- Bigrams are the engine's word 2-grams (:func:`text.shingles` with
  n=2, including its short-document whole-text fallback); NULL text is
  excluded on both the training and scoring side.
- The model is the DISCOUNTED conditional
  ``p(v | u) = c(uv) / (c(u·) + 1)`` where ``c(uv)`` is the corpus
  count of the bigram and ``c(u·)`` the count of all bigrams sharing
  its first token — Laplace's rule-of-succession shape. The +1 is
  load-bearing: under plain MLE a bigram whose prefix occurs exactly
  once gets p = 1/1 = 1.0, so gibberish made of corpus-unique tokens
  would score PERFECTLY predictable (every rare context is trivially
  "fully predicted" by its one continuation). The discount caps a
  once-seen transition at 1/2 while a transition seen 9-of-9 times
  scores 9/10 — evidence mass, not just conditional purity. Still
  exact: integer + 1 in the denominator, one IEEE division per term.
- The document score is the MEAN CONDITIONAL PROBABILITY
  ``lm_score = (Σ_positions p(v|u)) / n_bigrams``. The standard report
  is mean LOG probability (perplexity), but libm ``log`` is only
  1-ulp-reproducible across engines — not good enough for hash parity —
  so the engine keeps the probabilities raw (same determinism trade as
  the rational-idf BM25 and ratio-scored tf-idf: exact integers into
  one IEEE division per term, summed in a pinned order). The raw mean
  ranks "predictable" above "surprising" text exactly as intended; it
  is not numerically interchangeable with perplexity and is documented
  as such.
- Per-document summation is the engine's sorted sequential fold
  (sort by gram, then left-fold the doubles), so float addition order
  is pinned on both engines. Each distinct gram contributes
  ``tf · p(v|u)`` — one multiply before the fold, not tf fold steps.

Scale posture (100 TB):

- One explode+aggregate produces (doc_id, gram, tf); the model
  ``c(uv)`` and prefix totals ``c(u·)`` are window sums over that table
  partitioned by the prefix token (r13 — both are exact integer rollups
  of the same rows the old model/prefix join chain aggregated, so every
  score is bit-identical), which makes the whole computation ONE
  exchange of the pairs table plus the final per-document aggregation.
  Text never rides any shuffle; no cache is held.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forgettable_spark.extensions.text import shingles


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    spine: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Score every document under the corpus bigram LM (module
    docstring): (doc_id, n_bigrams, lm_score), lm_score in (0, 1).
    With a prebuilt ``spine`` (extensions/postings.py) the corpus
    explode is skipped: ``pairs`` IS the spine's bigram table (same
    shingle contract, short-doc fallback included)."""
    from pyspark.sql import Window

    if spine is not None:
        pairs = spine["bigrams"]
    else:
        pairs = (
            docs.filter(F.col(text_col).isNotNull())
            .select(
                F.col(id_col).alias("doc_id"),
                F.explode(shingles(F.col(text_col), n=2)).alias("gram"),
            )
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    # r13 (guide §2.4 — remove shuffles outright): the model rollup
    # c(uv), the prefix rollup c(u·) and the two joins that re-attached
    # them to the pairs table are TWO WINDOW SUMS over ONE exchange.
    # c(uv) = Σ tf over pairs sharing the gram; c(u·) = Σ_v c(uv) =
    # Σ tf over pairs sharing the prefix token — both exact integer
    # sums of the same operands, so every per-row double below is
    # bit-identical to the join form (the oracle still computes the
    # rollups as standalone CTEs and hash-matches). The gram window
    # partitions by (_u, gram) — gram determines its prefix, so the
    # extra key changes nothing — which lets hashpartitioning(_u) serve
    # BOTH windows: one exchange of the pairs table (plus the final
    # per-doc aggregation) instead of the previous six-exchange
    # cache/rollup/join chain (before: 2 pairs-sized + 3 model-sized
    # exchanges + a scope cache; after-plan: 2 Exchange total).
    # Scale note: the c(u·) window buffers one prefix-token group per
    # task; groups are bounded by the per-prefix distinct-(doc, gram)
    # count, and WindowExec spills — the trade for dropping the
    # corpus-sized pairs cache and four rollup/join stages.
    w_u = Window.partitionBy("_u")
    w_uv = Window.partitionBy("_u", "gram")
    scored = (
        pairs.withColumn("_u", F.split(F.col("gram"), " ")[0])
        .withColumn("_c_u", F.sum("tf").over(w_u))
        .withColumn("_c_uv", F.sum("tf").over(w_uv))
        .select(
            "doc_id",
            "gram",
            "tf",
            (
                F.col("tf").cast("double")
                * (
                    F.col("_c_uv").cast("double")
                    / (F.col("_c_u") + 1).cast("double")
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gram", "_s"))),
                    lambda x: x["_s"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.sum("tf").cast("double")
        ).alias("lm_score"),
    )


#: DuckDB twin of :func:`bigram_lm_score` over the pre-registered
#: ``documents`` view — same bigrams (incl. the short-doc fallback),
#: same MLE model, same sorted-fold mean.
LM_SCORE_ORACLE_SQL = """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w, text
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, CASE WHEN len(w) >= 2 THEN
    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
  ELSE [text] END AS gs FROM tok
),
pairs AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(gs) AS gram FROM grams)
  GROUP BY doc_id, gram
),
model AS (SELECT gram, CAST(SUM(tf) AS BIGINT) AS c_uv FROM pairs GROUP BY gram),
prefix AS (
  SELECT string_split(gram, ' ')[1] AS u, CAST(SUM(c_uv) AS BIGINT) AS c_u
  FROM model GROUP BY u
),
scored AS (
  SELECT p.doc_id, p.gram, p.tf,
    CAST(p.tf AS DOUBLE) * (CAST(m.c_uv AS DOUBLE) / CAST(x.c_u + 1 AS DOUBLE)) AS s
  FROM pairs p
  JOIN model m USING (gram)
  JOIN prefix x ON string_split(p.gram, ' ')[1] = x.u
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
  list_sum(list_transform(list_sort(list({'gram': gram, 's': s})), x -> x.s))
    / CAST(SUM(tf) AS DOUBLE) AS lm_score
FROM scored GROUP BY doc_id"""
