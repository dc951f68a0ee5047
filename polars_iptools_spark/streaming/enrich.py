"""Structured Streaming surface.

Every scalar function in this engine is a stateless Column expression
or Arrow UDF, so the batch API composes with ``readStream`` unchanged
(the reference has no streaming at all — SURVEY.md §2.3; this is the
Spark-native extension).  This module adds the streaming-specific
pieces: watermarked windowed indicator aggregation and streaming
dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import iptools


def extract_indicators_stream(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    ipv6: bool = False,
    only_public: bool = True,
) -> DataFrame:
    """Streaming extraction: one output row per (event, indicator)."""
    extractor = (
        iptools.extract_public_ips(F.col(text_col), ipv6=ipv6)
        if only_public
        else iptools.extract_ips(F.col(text_col), ipv6=ipv6)
    )
    return stream.withColumn("ips", extractor).select(
        F.col(ts_col).alias("ts"),
        F.explode("ips").alias("ip"),
    )


def windowed_indicator_counts(
    indicators: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per indicator.

    Late rows beyond the watermark are dropped by the engine; state is
    bounded — the canonical streaming-agg shape for 100 TB/day feeds.
    """
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        indicators.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("ip"))
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "ip",
            "hits",
        )
    )


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "event_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """:func:`windowed_indicator_counts` generalized to any
    (timestamp, key, id) event feed — watermarked tumbling-window
    count plus min/max id per key (integer aggregates, so results are
    bit-stable regardless of add order across partitions)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "key",
            "n",
            "min_id",
            "max_id",
        )
    )


def dedup_stream(
    stream: DataFrame, key_cols: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def first_seen_indicators(indicators: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): emit each
    indicator IP exactly once — the first time it is ever seen — with
    its first timestamp; later sightings only bump the per-key state
    counter.  The threat-intel "new indicator" feed, with state bounded
    by the distinct-indicator count.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "ip string, first_ts timestamp, hits long"
    state_schema = "first_ts timestamp, hits long"

    def fn(key, pdfs, state: GroupState):
        total = 0
        first = None
        for pdf in pdfs:
            total += len(pdf)
            batch_min = pdf["ts"].min()
            first = batch_min if first is None else min(first, batch_min)
        if state.exists:
            old_first, old_hits = state.get
            state.update((old_first, old_hits + total))
            return iter(())
        state.update((first, total))
        return iter(
            [pd.DataFrame([{"ip": key[0], "first_ts": first, "hits": total}])]
        )

    return indicators.groupBy("ip").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def first_seen_indicators_native(indicators: DataFrame) -> DataFrame:
    """JVM-native fast path of :func:`first_seen_indicators`: streaming
    ``dropDuplicates`` keeps exactly one row per key ever seen (state =
    one compact row per distinct key — the same bound) and emits it in
    the key's first micro-batch, with zero Python state workers.

    Measured 8.4x the stateful op's throughput at 100k keys
    (``BENCH/streaming_scale.py``) because `applyInPandasWithState`
    pays a per-group Python crossing — at high key cardinality that
    overhead IS the cost.

    Contract differences vs the stateful op (why both exist): no
    running ``hits`` counter, and ``first_ts`` is the row the state
    store happened to see first within the key's first micro-batch
    (nondeterministic among same-batch ties) rather than that batch's
    minimum.  The emitted KEY set and its batch-of-first-emission are
    identical.

    State retention: ``dropDuplicates`` here carries NO watermark, so
    state rows are never evicted — state grows with distinct-key
    cardinality forever (the same bound as the stateful op, which also
    never times out, but worth knowing for a continuous deployment: the
    query can never reclaim state).  For bounded retention use
    :func:`first_seen_indicators_bounded`, which trades "first ever"
    for "first within the watermark horizon".
    """
    return indicators.select(
        "ip", F.col("ts").alias("first_ts")
    ).dropDuplicates(["ip"])


def first_seen_indicators_bounded(
    indicators: DataFrame, watermark: str = "24 hours"
) -> DataFrame:
    """Bounded-retention first-seen feed: the deployment-correct
    variant of :func:`first_seen_indicators_native` for continuous
    streams over unbounded indicator cardinality.

    ``dropDuplicatesWithinWatermark`` keeps a key's state row only
    until the event-time watermark passes its expiration, then
    reclaims it — so state is bounded by the number of distinct keys
    RECENTLY seen, not ever seen.  Expiration is anchored at the FIRST
    retained sighting's event time plus the ``watermark`` delay;
    suppressed duplicates are dropped WITHOUT extending it (Spark
    guarantees deduplication only within the "time distance of
    earliest and latest events"), so a continuously-seen key is
    re-emitted as newly seen roughly once per watermark period —
    "at most one emission per watermark window since first sighting"
    rather than "first ever".
    Within a horizon the contract matches the native op, including its
    tie caveat: among same-batch duplicate rows of one key, the
    retained ``first_ts`` is whichever row the state store saw first.

    JVM-native, zero Python state workers, same append-mode sink
    surface as the other first-seen ops.
    """
    return (
        indicators.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["ip"])
        .select("ip", F.col("ts").alias("first_ts"))
    )


def enrich_stream(stream: DataFrame, ip_col: str | Column, db_dir: str | None = None) -> DataFrame:
    """Geo-enrich a streaming indicator column; the broadcast interval
    table is resolved once at plan time, exactly as in batch."""
    from ..functions import geoip

    return stream.withColumn("geo", geoip.full(ip_col, db_dir=db_dir))
