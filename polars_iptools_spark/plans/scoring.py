"""Candidate-pair similarity scoring.

Levenshtein is Spark-native (JVM, codegen).  Jaro-Winkler has no Spark
built-in, so it's computed in a single Arrow-batched pandas UDF over
all feature pairs at once — one JVM↔Python crossing per batch, per the
north_star ("batched Jaro-Winkler/Levenshtein ... in a single Arrow
UDF").  The JW implementation is written from scratch (textbook
definition), no external string library (none available in-sandbox).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    jw = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= max_prefix:
            break
        prefix += 1
    return jw + prefix * p * (1.0 - jw)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    cache: dict[tuple[str, str], float] = {}
    for i in range(len(av)):
        x, y = av[i], bv[i]
        if x is None or y is None:
            out[i] = 0.0
            continue
        key = (x, y)
        v = cache.get(key)
        if v is None:
            v = jaro_winkler(x, y)
            cache[key] = v
        out[i] = v
    return pd.Series(out)


def levenshtein_sim(a: Column, b: Column) -> Column:
    """Normalized 1 - lev/maxlen, JVM-native."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / mx
    )


def hot_candidates(
    pairs: DataFrame,
    ip_cols: tuple[str, str] = ("ip_a", "ip_b"),
    path_cols: tuple[str, str] = ("path_a", "path_b"),
    weights: tuple[float, float, float] = (0.6, 0.25, 0.15),
    threshold: float = 0.72,
) -> DataFrame:
    """Pairs whose score *upper bound* (JVM-only terms, perfect-JW
    assumption) can reach the threshold — the only rows that ever need
    the Python scorer.  The heavy terms ride along as materialized
    columns so the exact scorer never recomputes them.

    This is the stage worth checkpointing at scale: it shrinks the
    quadratic pair stream to near-edge size entirely JVM-side.
    """
    w_ip, w_path, w_repo = weights
    ip_sim = (
        F.when(F.col(ip_cols[0]) == F.col(ip_cols[1]), F.lit(1.0))
        .otherwise(0.5 * levenshtein_sim(F.col(ip_cols[0]), F.col(ip_cols[1])))
    )
    lev_path = levenshtein_sim(F.col(path_cols[0]), F.col(path_cols[1]))
    base = pairs.withColumn("ip_sim", ip_sim).withColumn("lev_path", lev_path)
    upper = (
        w_ip * F.col("ip_sim")
        + w_path * (0.5 + 0.5 * F.col("lev_path"))
        + w_repo * F.lit(1.0)
    )
    return base.withColumn("ub", upper).where(F.col("ub") >= threshold)


def exact_score_hot(
    hot: DataFrame,
    path_cols: tuple[str, str] = ("path_a", "path_b"),
    repo_cols: tuple[str, str] = ("repo_a", "repo_b"),
    weights: tuple[float, float, float] = (0.6, 0.25, 0.15),
) -> DataFrame:
    """Exact blended score over hot candidates (expects the materialized
    ip_sim / lev_path columns from :func:`hot_candidates`)."""
    w_ip, w_path, w_repo = weights
    path_sim = 0.5 * jaro_winkler_udf(
        F.col(path_cols[0]), F.col(path_cols[1])
    ) + 0.5 * F.col("lev_path")
    repo_sim = jaro_winkler_udf(F.col(repo_cols[0]), F.col(repo_cols[1]))
    return hot.withColumn(
        "score", w_ip * F.col("ip_sim") + w_path * path_sim + w_repo * repo_sim
    )


def score_pairs(
    pairs: DataFrame,
    ip_cols: tuple[str, str] = ("ip_a", "ip_b"),
    path_cols: tuple[str, str] = ("path_a", "path_b"),
    repo_cols: tuple[str, str] = ("repo_a", "repo_b"),
    weights: tuple[float, float, float] = (0.6, 0.25, 0.15),
    prune_threshold: float | None = None,
) -> DataFrame:
    """Blend of exact/edit similarity over normalized IP + path + repo.

    ip similarity mixes exact equality with normalized Levenshtein so
    near-miss IPs in the same /24 score in the discriminating mid-range
    rather than collapsing to 0/1.

    ``prune_threshold``: branch-and-bound guard for the Python-side
    Jaro-Winkler.  The JVM-side terms (ip equality, Levenshtein) give an
    exact *upper bound* on the final score assuming perfect JW; pairs
    whose bound is below the threshold can never become edges, so they
    skip the Arrow UDF entirely (their ``score`` is the bound, which is
    < threshold — edge extraction is unchanged).  At web scale this
    collapses Python scoring cost to the tiny candidate set that can
    actually match.
    """
    w_ip, w_path, w_repo = weights
    ip_sim = (
        F.when(F.col(ip_cols[0]) == F.col(ip_cols[1]), F.lit(1.0))
        .otherwise(0.5 * levenshtein_sim(F.col(ip_cols[0]), F.col(ip_cols[1])))
    )
    lev_path = levenshtein_sim(F.col(path_cols[0]), F.col(path_cols[1]))

    def exact(df: DataFrame) -> DataFrame:
        path_sim = 0.5 * jaro_winkler_udf(
            F.col(path_cols[0]), F.col(path_cols[1])
        ) + 0.5 * lev_path
        repo_sim = jaro_winkler_udf(F.col(repo_cols[0]), F.col(repo_cols[1]))
        return df.withColumn(
            "score", w_ip * ip_sim + w_path * path_sim + w_repo * repo_sim
        )

    if prune_threshold is None:
        return exact(pairs)

    # Single pass: the pair join runs once and the heavy JVM terms
    # (Levenshtein, ip similarity) are MATERIALIZED as columns so they
    # are evaluated exactly once per row — referencing the expressions
    # again in the final score projection would silently recompute them.
    # The JW UDF's inputs are null-gated: cold rows cross the Arrow
    # boundary as nulls (near-free) and only hot rows pay for JW.
    base = pairs.withColumn("_ip_sim", ip_sim).withColumn("_lev_path", lev_path)
    upper = (
        w_ip * F.col("_ip_sim")
        + w_path * (0.5 + 0.5 * F.col("_lev_path"))
        + w_repo * F.lit(1.0)
    )
    with_ub = base.withColumn("_ub", upper)
    hot = F.col("_ub") >= prune_threshold
    gate = lambda c: F.when(hot, F.col(c))  # noqa: E731
    jw_path = jaro_winkler_udf(gate(path_cols[0]), gate(path_cols[1]))
    jw_repo = jaro_winkler_udf(gate(repo_cols[0]), gate(repo_cols[1]))
    path_sim = 0.5 * jw_path + 0.5 * F.col("_lev_path")
    exact_score = (
        w_ip * F.col("_ip_sim") + w_path * path_sim + w_repo * jw_repo
    )
    return with_ub.withColumn(
        "score", F.when(hot, exact_score).otherwise(F.col("_ub"))
    ).drop("_ub", "_ip_sim", "_lev_path")
