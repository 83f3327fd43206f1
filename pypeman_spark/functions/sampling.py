"""Deterministic, engine-portable sampling for corpus construction.

``df.sample``/``sampleBy`` are seeded-RNG based: the kept set depends on
partitioning and Spark's sampler internals, so it is not reproducible
across engines, re-runs with different file splits, or cluster sizes.
Corpus pipelines need *content-addressed* sampling instead: a document
is kept iff a hash of its id clears a threshold. Properties that matter
at 100 TB:

* **reproducible** anywhere — same ids kept on any engine (md5-based,
  so the DuckDB oracle computes the identical keep-set);
* **stable under data growth** — a doc's keep/drop never changes as
  neighbours arrive (critical for incremental corpus refreshes);
* **consistent splits** — disjoint salts give independent samples; the
  same salt with nested fractions gives nested samples (a 1% sample is
  a subset of the 10% sample), which is how train/val/test splits stay
  leak-free.

All pure column expressions; the filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_sample", "stratified_hash_sample"]

#: hash space resolution: fractions quantize to 1/1e6
_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of (salt ':' id) — the first
    8 hex chars as an integer. Engine-portable: DuckDB computes the same
    value with ``CAST('0x' || substring(md5(...), 1, 8) AS BIGINT)``."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket < fraction·1e6. Nested: a 0.01 sample
    with the same salt is a strict subset of the 0.1 sample."""
    return df.filter(hash_bucket(F.col(id_col), salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep rates (e.g. language rebalancing: keep 10% of
    'en', all of 'fr'). Strata not in ``fractions`` default to
    ``default``. One scan, no shuffle — the rate lookup compiles to a
    CASE expression next to the hash filter."""
    rate = F.lit(int(default * _BUCKETS))
    for k, v in fractions.items():
        rate = F.when(F.col(strata_col) == k, F.lit(int(v * _BUCKETS))).otherwise(rate)
    return df.filter(hash_bucket(F.col(id_col), salt) < rate)
