"""Blocked fuzzy matching: edit-distance pairs within candidate blocks.

Entity-resolution primitive: find record pairs whose names are within a
Levenshtein budget, WITHOUT the O(n²) cross product — candidates come
from equality blocks (brand/category/zip...) plus two admissible
per-pair prunes, and the exact DP distance runs only on survivors:

1. length band: |len(l) − len(r)| ≤ d (edit distance is at least the
   length gap);
2. character-set bitmap: each side precomputes a 64-bit bitmap of the
   characters it contains (map-side, once per ROW); one edit changes
   the distinct-character set by at most 2 (a substitution can retire
   one character and introduce another), so
   ``bit_count(bitmap_l XOR bitmap_r) > 2·d`` proves distance > d.
   Bit collisions (pmod 64) only ever UNDER-count the symmetric
   difference, so the filter never rejects a true match. One xor +
   popcount per pair versus the O(len·d) banded DP — measured at sf0.1
   it prunes 6.9M band pairs to 1.1M DP calls and halves the operator
   (6.2 s → 3.0 s) with an identical result set.

Levenshtein is integer-exact and identically defined everywhere
(``F.levenshtein`` / DuckDB ``levenshtein``), so the op is hash-gateable
— no float parity concerns; ``_blocked_pairs_naive`` (band + DP only)
stays as the equivalence oracle for the admissibility tests.

Scale: the join is a plain equi-join on the block key (one shuffle,
co-partitioned self-join); the quadratic step is bounded by the largest
block, which the caller controls via the blocking key (at web scale:
block on q-gram LSH buckets the way q22 blocks Jaccard candidates — the
same candidate-generation machinery in dedup.lsh_candidate_pairs applies
to names verbatim). Both prunes are admissible filters evaluated inside
whole-stage codegen before the DP; a partition-based candidate scheme
(PassJoin-style segment equi-join) was measured SLOWER here — the
corpus' tiny word alphabet shares aligned substrings too freely, so the
candidate join plus pair-dedup outweighed the DP it saved.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def charset_bitmap(text_col: str) -> Column:
    """64-bit presence bitmap of the characters in ``text_col`` (bit =
    ascii(c) mod 64). Map-only; pairs with more than ``2·d`` differing
    bits cannot be within edit distance d."""
    return F.expr(
        f"aggregate(split({text_col}, ''), 0L, "
        f"(acc, c) -> acc | shiftleft(1L, pmod(ascii(c), 64)))"
    )


def _verify(
    joined: DataFrame, text_col: str, id_col: str, max_dist: int
) -> DataFrame:
    """Thresholded banded DP (O(len·d) per pair, −1 past the budget) on
    candidate pairs; exact distances for kept pairs."""
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
    staged = df.select(*keep).withColumn("__bm", charset_bitmap(text_col))
    left = staged.select(
        *[F.col(c).alias(f"l_{c}") for c in [*keep, "__bm"]]
    )
    right = staged.select(
        *[F.col(c).alias(f"r_{c}") for c in [*keep, "__bm"]]
    )
    # Predicate ORDER is load-bearing: the conjunction short-circuits
    # left-to-right, so the O(1) prunes must precede the O(len·d) DP. A
    # post-join .filter(distance >= 0) instead gets pushed into the join
    # condition PREPENDED — the DP then runs first on every block pair
    # and the prunes buy nothing (measured: 6.2 s vs 3.0 s at sf0.1).
    # Spark keeps the given conjunct order; the projection recomputes
    # the distance for the ~3% of pairs that survive.
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
        # admissible charset prune: dist >= popcount(xor)/2
        F.bit_count(F.col("l___bm").bitwiseXOR(F.col("r___bm")))
        <= 2 * max_dist,
        # the banded DP itself, LAST
        F.levenshtein(
            F.col(f"l_{text_col}"), F.col(f"r_{text_col}"), max_dist
        )
        >= 0,
    ]
    return left.join(right, cond).select(
        F.col(f"l_{id_col}").alias("left_id"),
        F.col(f"r_{id_col}").alias("right_id"),
        F.col(f"l_{text_col}").alias("left_text"),
        F.col(f"r_{text_col}").alias("right_text"),
        F.levenshtein(
            F.col(f"l_{text_col}"), F.col(f"r_{text_col}"), max_dist
        )
        .cast("int")
        .alias("distance"),
    )


def _blocked_pairs_naive(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    id_col: str,
    max_dist: int,
) -> DataFrame:
    """Reference implementation: block² join + length band + DP, no
    bitmap prune — the equivalence oracle proving the prune admissible."""
    keep = [*block_cols, id_col, text_col]
    left = df.select(*[F.col(c).alias(f"l_{c}") for c in keep])
    right = df.select(*[F.col(c).alias(f"r_{c}") for c in keep])
    cond = [F.col(f"l_{c}") == F.col(f"r_{c}") for c in block_cols] + [
        F.col(f"l_{id_col}") < F.col(f"r_{id_col}"),
        F.abs(
            F.length(F.col(f"l_{text_col}"))
            - F.length(F.col(f"r_{text_col}"))
        )
        <= max_dist,
    ]
    return _verify(left.join(right, cond), text_col, id_col, max_dist)
