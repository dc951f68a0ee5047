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

import time

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


def _violations(edges: DataFrame) -> DataFrame:
    """Nodes breaking the 2-level-forest condition: a node is violating
    unless it appears exactly once as src and never as dst (a settled
    star member) or only as dst (a settled star root)."""
    return (
        edges.select(F.col("src").alias("node"), F.lit(1).alias("s"), F.lit(0).alias("d"))
        .union(
            edges.select(F.col("dst").alias("node"), F.lit(0).alias("s"), F.lit(1).alias("d"))
        )
        .groupBy("node")
        .agg(F.sum("s").alias("s"), F.sum("d").alias("d"))
        .where((F.col("s") > 1) | ((F.col("s") > 0) & (F.col("d") > 0)))
        .select("node")
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
    return _violations(edges).isEmpty()


PEEL_AUTO_THRESHOLD = 1_000_000


def connected_components(
    edges: DataFrame, max_iterations: int = 50, checkpoint: bool = True,
    stats: dict | None = None, peel_after: int | str | None = "auto",
) -> DataFrame:
    """(src,dst) edge list -> (node, component) with component = the
    minimum node id of the connected component.

    Nodes appearing only in self-loops / isolated are still returned
    (component = themselves).

    ``peel_after``: from this superstep on, stars that have fully
    settled are MOVED OUT of the working edge set instead of being
    re-contracted every remaining iteration.  This is the decisive
    scale property for the entity-resolution workload (a sea of small
    already-converged clusters plus one high-diameter component that
    alone drives the O(log d) iteration count): without peeling, the
    sea's |E| star edges ride through every superstep — at the 9.8M-node
    giant-closure input that is 6.4M frozen rows × 17 supersteps of
    pure re-shuffle.  Soundness: a star none of whose nodes violates
    the 2-level-forest condition is (a) a whole component — any edge
    touching a member or the root from outside would put that node in
    the violation set (member as src twice, member as dst, or root as
    src) or be part of the star's own dst-group — and (b) a fixpoint of
    both operators, so freezing it early yields exactly the edges the
    final forest would contain.

    The peel's extra per-superstep joins are a fixed cost while its
    benefit scales with the settled mass, so the default (``"auto"``)
    resolves by input size: peel from the FIRST superstep when the
    normalized edge count is ≥ ``PEEL_AUTO_THRESHOLD`` (at corpus
    scale the bulk of an entity-resolution graph is small clusters
    that are star forests within one contraction — measured 45 s vs
    67 s on the 9.8M-node giant input), else from superstep 2 so that
    small / near-clique workloads that converge in ≤2 supersteps never
    pay the joins (measured +0.2-0.4 s there).  Pass an int to pin the
    first peeling superstep, or ``None`` to disable peeling.

    ``stats``: optional dict that receives ``{"supersteps": k}`` — the
    scale-evidence hook (superstep count is the O(log diameter) bound
    a giant component must not break) — plus driver-measured phase
    walls (``normalize_s``, ``superstep_walls``: the per-iteration
    star-contract + checkpoint + forest-check seconds) so a slow run
    can be attributed to a phase instead of adjudicated by total wall.
    Phase walls are only meaningful when ``checkpoint=True`` (eager
    materialization forces each superstep inside its loop iteration).
    """
    aligned = _aligned(edges)
    t0 = time.monotonic()
    e = _normalize(aligned)
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    if peel_after == "auto":
        # the count is one cheap job over the just-materialized frame
        # when checkpointing (the normal path); without materialized
        # edges it would force an extra full evaluation — not worth it,
        # take the small-input setting.
        peel_after = (
            0 if checkpoint and e.count() >= PEEL_AUTO_THRESHOLD else 2
        )
    if stats is not None:
        stats["normalize_s"] = round(time.monotonic() - t0, 2)
        stats["superstep_walls"] = []
        stats["peel_after"] = peel_after
    frozen: list[DataFrame] = []
    for step in range(max_iterations):
        t0 = time.monotonic()
        e = _small_star(_large_star(e))
        peel = peel_after is not None and step >= peel_after
        if peel:
            # ONE materialization job per superstep: the contract, the
            # violation aggregation, the dirty-root derivation and the
            # flag join all live in the same plan (the repeated viol /
            # contract subtrees end in exchanges, which AQE reuses),
            # and the done-probe + peel split are cheap filters over
            # the checkpointed result.  Splitting these into separate
            # eager checkpoints costs one job-scheduling round-trip
            # each — which DOMINATES the post-peel supersteps, where
            # the working set is only the still-churning remnant.
            viol = _violations(e)
            dirty_roots = (
                e.join(viol.withColumnRenamed("node", "src"), "src", "left_semi")
                .select("dst")
                .union(
                    e.join(viol.withColumnRenamed("node", "dst"), "dst", "left_semi")
                    .select("dst")
                )
                .dropDuplicates()
            )
            flagged = e.join(
                dirty_roots.withColumn("__dirty", F.lit(1)), "dst", "left"
            )
            if checkpoint:
                flagged = flagged.localCheckpoint(eager=True)
            done = flagged.where(F.col("__dirty") == 1).isEmpty()
            if done:
                # all edges quiet: flagged IS the final forest
                e = flagged.select("src", "dst")
            else:
                frozen.append(
                    flagged.where(F.col("__dirty").isNull()).select("src", "dst")
                )
                e = flagged.where(F.col("__dirty") == 1).select("src", "dst")
        else:
            if checkpoint:
                e = e.localCheckpoint(eager=True)
            done = _is_star_forest(e)
        if stats is not None:
            stats["superstep_walls"].append(round(time.monotonic() - t0, 2))
        if done:
            if stats is not None:
                stats["supersteps"] = step + 1
            break
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} supersteps")
    # converged: edges (working set + peeled stars) are (node, root)
    # stars.  In a 2-level forest no dst is ever a src
    # (_is_star_forest), so the root set is EXACTLY distinct(dst) —
    # emitting roots from the converged star edges replaces the
    # previous all-nodes path, an O(2|E|) union+dedup over the RAW
    # input plus an O(|V|) anti-join, with a dedup over |components|
    # rows.  At the 9.8M-node giant-closure input that all-nodes path
    # was a 13M-row shuffle + 9.8M-row anti-join spent almost entirely
    # on re-deriving what the forest already states.
    for fr in frozen:
        e = e.union(fr)
    assign = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = (
        assign.select(F.col("component").alias("node")).dropDuplicates()
        .select("node", F.col("node").alias("component"))
    )
    out = assign.union(roots)
    # Contract: nodes appearing ONLY in self-loops still come back as
    # their own singleton component.  _normalize drops src==dst rows,
    # so such nodes never reach the forest; they exist only if the raw
    # input has self-loops — probed with a narrow limit-1 scan (no
    # shuffle), keeping the common loop-free case on the cheap path.
    has_loops = not aligned.where(F.col("src") == F.col("dst")).isEmpty()
    if has_loops:
        loop_only = (
            aligned.where(F.col("src") == F.col("dst"))
            .select(F.col("src").alias("node"))
            .dropDuplicates()
            .join(out.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        out = out.union(loop_only)
    return out
