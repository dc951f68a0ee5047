"""Distributed connected components via alternating large-star /
small-star DataFrame self-joins (Kiveris et al., "Connected Components
in MapReduce and Beyond", SOCC'14 — public algorithm, re-derived here
on the Spark DataFrame API).

Why this shape at 100 TB: each superstep is two key-co-partitioned
shuffles (groupBy + join on the same key, so AQE reuses the exchange),
edge count shrinks monotonically toward star graphs, and convergence is
detected by checking the 2-level-forest termination state directly
(one constant-size aggregation — no driver-side edge collection, and
no extra changed-nothing superstep).  Lineage is truncated per
superstep with ``localCheckpoint`` or plans grow exponentially
(SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _aligned(edges: DataFrame) -> DataFrame:
    """src/dst projected to ONE orderable type: node ids pass through
    when the two sides already agree (so 128-bit hex-string rids and
    native longs both work), else both are cast to long (legacy mixed
    numeric inputs)."""
    t_src = edges.schema["src"].dataType
    t_dst = edges.schema["dst"].dataType
    if t_src == t_dst:
        return edges.select("src", "dst")
    return edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )


def _normalize(edges: DataFrame) -> DataFrame:
    e = edges.where(F.col("src") != F.col("dst"))
    return e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).dropDuplicates()


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: attach all strictly-larger neighbors to
    min(N(u) ∪ {u}).

    No dedup here: each undirected edge contributes exactly one
    dst>src orientation, so the output is ≤ |E| rows with or without
    it — the dedup shuffle bought nothing per superstep (small_star
    deduplicates its own output, keeping |E| monotone)."""
    nbrs = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", F.col("src")).alias("m"))
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; attach each low neighborhood (and the
    center) to its minimum."""
    es = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = (
        es.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", F.col("src")).alias("m"))
    )
    out1 = es.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    out2 = mins.select(F.col("src").alias("src"), F.col("m").alias("dst"))
    return (
        out1.union(out2).where(F.col("src") != F.col("dst")).dropDuplicates()
    )


def _is_star_forest(edges: DataFrame) -> bool:
    """Converged ⟺ the edge set is a forest of 2-level stars oriented
    member→root: every src appears exactly once and no src is also a
    dst.  This is the algorithm's documented termination state (Kiveris
    et al. §3: small-star/large-star converge to 2-level trees), and
    checking it directly saves the extra superstep the previous
    changed-nothing checksum comparison needed — on near-clique inputs
    (linkage blocks) that halves the superstep count.

    Sufficiency: both operators preserve connected components, so a
    2-level forest state means each star IS a whole component; and
    small_star output always has dst ≤ src (every emitted dst is the
    min of a neighborhood containing the src), so the star root is the
    component minimum — exactly the final assignment.  One constant-
    size aggregation job (isEmpty with limit-1 early abort), no driver
    edge collection."""
    viol = (
        edges.select(F.col("src").alias("node"), F.lit(1).alias("s"), F.lit(0).alias("d"))
        .union(
            edges.select(F.col("dst").alias("node"), F.lit(0).alias("s"), F.lit(1).alias("d"))
        )
        .groupBy("node")
        .agg(F.sum("s").alias("s"), F.sum("d").alias("d"))
        .where((F.col("s") > 1) | ((F.col("s") > 0) & (F.col("d") > 0)))
    )
    return viol.isEmpty()


def connected_components(
    edges: DataFrame, max_iterations: int = 50, checkpoint: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """(src,dst) edge list -> (node, component) with component = the
    minimum node id of the connected component.

    Nodes appearing only in self-loops / isolated are still returned
    (component = themselves).

    ``stats``: optional dict that receives ``{"supersteps": k}`` — the
    scale-evidence hook (superstep count is the O(log diameter) bound
    a giant component must not break).
    """
    aligned = _aligned(edges)
    all_nodes = (
        aligned.select(F.col("src").alias("node"))
        .union(aligned.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    e = _normalize(aligned)
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    for step in range(max_iterations):
        e = _small_star(_large_star(e))
        if checkpoint:
            e = e.localCheckpoint(eager=True)
        if _is_star_forest(e):
            if stats is not None:
                stats["supersteps"] = step + 1
            break
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} supersteps")
    # converged: edges are (node, root) stars
    assign = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots_and_singletons = all_nodes.join(
        assign.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return assign.union(roots_and_singletons)
