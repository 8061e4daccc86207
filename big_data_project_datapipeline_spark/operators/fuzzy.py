"""Blocked fuzzy matching: edit-distance pairs within candidate blocks.

Entity-resolution primitive: find record pairs whose names are within a
Levenshtein budget, WITHOUT the O(n²) cross product — candidates come
from equality blocks (brand/category/zip...) plus a length band, and the
exact DP distance runs only inside a block.

Levenshtein is integer-exact and identically defined everywhere
(``F.levenshtein`` / DuckDB ``levenshtein``), so the op is hash-gateable
— no float parity concerns.

Scale: the join is a plain equi-join on the block key (one shuffle,
co-partitioned self-join); the quadratic step is bounded by the largest
block, which the caller controls via the blocking key (at web scale:
block on q-gram LSH buckets the way q22 blocks Jaccard candidates — the
same candidate-generation machinery in dedup.lsh_candidate_pairs applies
to names verbatim). The length-band predicate (|len(l)−len(r)| ≤ d)
is a free admissible filter: edit distance is at least the length gap,
so it prunes before the DP runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    id_col: str,
    max_dist: int,
) -> DataFrame:
    """Pairs (left_id, right_id, distance ≤ max_dist) within equality
    blocks; left_id < right_id dedups orientations. Identical strings
    match at distance 0 — callers wanting near-but-not-exact add
    ``distance > 0``.
    """
    keep = [*block_cols, id_col, text_col]
    left = df.select(
        *[F.col(c).alias(f"l_{c}") for c in keep]
    )
    right = df.select(
        *[F.col(c).alias(f"r_{c}") for c in keep]
    )
    cond = [
        F.col(f"l_{c}") == F.col(f"r_{c}") for c in block_cols
    ] + [
        F.col(f"l_{id_col}") < F.col(f"r_{id_col}"),
        # admissible length-band prune: dist >= |len difference|
        F.abs(
            F.length(F.col(f"l_{text_col}"))
            - F.length(F.col(f"r_{text_col}"))
        )
        <= max_dist,
    ]
    joined = left.join(right, cond)
    # Thresholded levenshtein runs the BANDED DP (O(len·d) per pair, not
    # O(len²)) and returns −1 past the budget — the dominant cost of the
    # whole operator at any scale, so the band matters more than any
    # join-side tweak. Exact distances for kept pairs are unchanged.
    return (
        joined.withColumn(
            "distance",
            F.levenshtein(
                F.col(f"l_{text_col}"), F.col(f"r_{text_col}"), max_dist
            ),
        )
        .filter(F.col("distance") >= 0)
        .select(
            F.col(f"l_{id_col}").alias("left_id"),
            F.col(f"r_{id_col}").alias("right_id"),
            F.col(f"l_{text_col}").alias("left_text"),
            F.col(f"r_{text_col}").alias("right_text"),
            F.col("distance").cast("int").alias("distance"),
        )
    )
