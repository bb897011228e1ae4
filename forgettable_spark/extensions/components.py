"""Connected components over near-duplicate pairs: the clustering step
that turns pairwise dedup output into actionable keep/drop decisions.

Near-dup detectors emit *pairs*; deduplication needs *clusters* (a≈b and
b≈c must collapse into one group even when a≈c was never tested). That is
graph connectivity — the one operator family here that no single SQL pass
expresses. The implementation is iterative min-label propagation
(Pregel-style "small-star" simplification): every node starts labeled
with its own id, and each round every node takes the minimum label in its
neighborhood. Convergence needs at most the graph diameter rounds — for
near-dup clusters that is tiny (clusters are cliques or short chains),
which is why large-scale dedup pipelines run exactly this loop.

Scale posture: each round is one join (labels × edges) plus one
aggregation, both shuffling on node ids; the driver only coordinates the
loop and reads a one-row convergence count per round.
``localCheckpoint`` every few rounds truncates the growing lineage so
round N doesn't replay rounds 1..N-1. The DuckDB oracle states the same
fixpoint as a recursive CTE (component label = min reachable node id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 25,
    checkpoint_every: int = 1,
    loop_partitions: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id of the component.

    Raises if the fixpoint is not reached within ``max_rounds`` — near-dup
    graphs converge in a handful of rounds, so hitting the cap signals a
    pathological input (e.g. a long path graph), not a tuning problem.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # Near-dup pair graphs are tiny relative to the corpus; the loop's cost
    # is dominated by per-task scheduling overhead at the session's default
    # shuffle width. Pin the loop to a narrow partitioning (and a stable
    # key, so the per-round join reuses it). Callers with genuinely huge
    # graphs pass a wider loop_partitions.
    if loop_partitions is None:
        loop_partitions = min(8, int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    edges = edges.repartition(loop_partitions, "src").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    prev_sum: int | None = None
    for round_idx in range(max_rounds):
        # candidate labels flowing along edges: each node offers its label
        # to every neighbor; a node keeps the min of its own and offers.
        offers = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # Materialize each round: new_labels feeds BOTH the convergence
        # probe and the next round — without an eager checkpoint every
        # round re-executes the whole chain of prior rounds (O(rounds²)
        # total work) and the loop crawls. The label table is one row per
        # node, so materialization is cheap; the checkpoint also truncates
        # lineage so the plan doesn't deepen.
        if checkpoint_every and (round_idx + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        # Convergence probe: labels only ever decrease, so the label sum is
        # strictly decreasing until the fixpoint — one aggregate over the
        # (already materialized) label table, no old-vs-new join.
        cur_sum = new_labels.agg(F.sum("component")).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(graph diameter exceeds the cap)"
    )


def dedup_keep_list(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize keep/drop decisions from near-dup pairs.

    Returns (doc_id, component, keep): nodes absent from any pair are
    singleton components (kept); inside each component only the minimum
    id survives — the same canonical-min rule as exact_dedup.
    """
    comp = connected_components(pairs)
    out = (
        all_ids.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("keep", F.col(id_col) == F.col("component"))
    )
    return out
