"""Deterministic corpus sampling: hash-rate and stratified quota.

Beyond-the-reference training-data operators (same family as
operators/corpusprep.py): corpus mixers down-sample over-represented
slices (per-language, per-source rates a la the C4/ROOTS mixture
tables) and draw fixed-size per-stratum evaluation samples.  Random
sampling (``df.sample``) is non-reproducible across runs and engines;
these operators derive the decision from the same engine-portable
md5-prefix hash as ``corpusprep.hash_bucket``, so

* a document's keep/drop decision never changes as the corpus grows,
* reruns and the DuckDB oracle reproduce it bit-exactly, and
* the sample is uniform: md5 prefixes are uniform in [0, 2^32).

Operators:

* ``hash_sample`` — keep a deterministic ``rate`` fraction (global or
  per-stratum via a rate map).  Map-only: a scalar hash compare, no
  shuffle, survives any scale.
* ``stratified_quota`` — exactly ``n`` docs per stratum, chosen by
  hash order (a deterministic uniform draw).  One shuffle on the
  stratum key; the rank window is per-stratum, and Spark pushes the
  rank filter down as WindowGroupLimit (partial top-n before the
  exchange), so a hot stratum ships at most ``n`` rows per input
  partition — safe even when one language dominates 10^12 rows.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .corpusprep import hash_bucket

# Denominator for rate thresholds: rates are quantized to 1/SCALE
# steps (plenty for mixture tables; keeps the oracle integral).
RATE_SCALE = 1_000_000


def _rate_threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return int(round(rate * RATE_SCALE))


def hash_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: float = 0.1,
    strata_col: Optional[str] = None,
    strata_rates: Optional[Mapping[str, float]] = None,
) -> DataFrame:
    """Deterministic rate sampling: keep a row iff its md5-prefix
    bucket (uniform in [0, RATE_SCALE)) falls below the rate
    threshold.  With ``strata_rates``, each stratum gets its own
    rate (``rate`` is the default for unlisted / NULL strata).
    Map-only — no shuffle."""
    b = hash_bucket(id_col, RATE_SCALE)
    if not strata_rates:
        # None OR an empty mapping (a mixture table with no
        # overrides): everything samples at the default rate
        keep: Column = b < F.lit(_rate_threshold(rate))
    else:
        if strata_col is None:
            raise ValueError("strata_rates requires strata_col")
        thr = None
        for name, r in sorted(strata_rates.items()):
            cond = F.col(strata_col) == F.lit(name)
            t = F.lit(_rate_threshold(r))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(_rate_threshold(rate)))
        keep = b < thr
    return docs.where(keep)


def stratified_quota(
    docs: DataFrame,
    strata_col: str = "lang",
    n: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` documents per stratum, chosen
    by (md5-prefix hash, id) order — a deterministic uniform draw
    without replacement.  Adds ``sample_rank`` (1-based within the
    stratum).  One shuffle on the stratum key; rank-filter pushdown
    (WindowGroupLimit) bounds per-partition spill for hot strata."""
    if n <= 0:
        raise ValueError("quota n must be positive")
    h = hash_bucket(id_col, RATE_SCALE).alias("_h")
    w = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        docs.withColumn("_h", h)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
        .drop("_h")
    )
