"""Fuzzy (edit-distance) string matching at scale.

``fuzzy_join_pairs`` finds every pair of rows whose string values are
within Levenshtein distance 1, EXACTLY, without the n² comparison: the
deletion-neighborhood blocking scheme (FastSS; Bocek et al. 2007, "Fast
Similarity Search in Large Dictionaries").  Every string emits its
0- and 1-deletion variants as block keys; two strings at distance <= 1
ALWAYS share a variant —

- substitution at position i: deleting i from both sides yields the
  same string;
- insertion/deletion: deleting the inserted character from the longer
  string yields the shorter one (whose 0-deletion variant it meets);
- equal strings meet at their 0-deletion variant —

so blocking recall is 1.0 by construction, and a final JVM-side
``levenshtein`` filter removes the false positives that merely share a
variant.  The entity-resolution primitive (near-identical names, typo'd
keys) next to the token-level dedup family.

Scale shape: variant explosion is map-side (L+1 keys per string of
length L — use on SHORT strings: names, codes, titles); candidate
generation groups by variant with the same one-pass pair expansion the
LSH dedup paths use (bucket-local, mega-bucket-guarded); verification
joins the candidate-bound id set back to the strings (hash joins) and
runs the built-in levenshtein — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.dedup import _bucket_local_pairs
from fluss_datafusion_spark.session import spread_small_scan


def _deletion_variants(col):
    """array of the string plus every single-character deletion of it.
    Pure expressions: transform over sequence(1, length)."""
    # sequence(1, 0) would DESCEND, not produce empty — guard length 0.
    deletions = F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substring(col, F.lit(1), i - 1),
                col.substr(i + 1, F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(F.array(col), deletions)


def fuzzy_join_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_bucket_size: int = 256,
) -> DataFrame:
    """All pairs (id_a, id_b, distance) with levenshtein(s_a, s_b) <= 1
    and id_a < id_b — exact, via deletion-neighborhood blocking (see
    module docstring).  ``max_bucket_size`` caps degenerate variant
    blocks (e.g. thousands of strings one deletion from the same core)
    exactly like the LSH mega-bucket guard, with an observe() metric.

    Callers should ``release_candidate_cache`` the result after
    materializing (the candidate stage persists for its two verify
    branches, same lifecycle as minhash_lsh_pairs)."""
    from fluss_datafusion_spark.operators.dedup import _attach_cached_deps

    base = spread_small_scan(df).select(
        F.col(id_col).alias("__id__"), F.col(str_col).alias("__s__")
    )
    blocks = base.select(
        "__id__", F.explode(_deletion_variants(F.col("__s__"))).alias("__v__")
    ).distinct()
    candidates = _bucket_local_pairs(
        blocks, ["__v__"], max_bucket_size, "fuzzy_block_guard"
    )
    cand_ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("__id__")
    ).distinct()
    strings = base.join(cand_ids, "__id__", "left_semi")
    sa, sb = F.broadcast(strings).alias("sa"), F.broadcast(strings).alias("sb")
    verified = (
        candidates.join(sa, F.col("id_a") == F.col("sa.__id__"))
        .join(sb, F.col("id_b") == F.col("sb.__id__"))
        .withColumn("distance", F.levenshtein(F.col("sa.__s__"), F.col("sb.__s__")))
        .filter(F.col("distance") <= 1)
        .select("id_a", "id_b", "distance")
    )
    return _attach_cached_deps(verified, candidates)
