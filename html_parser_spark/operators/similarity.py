"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against one query vector.
  JVM-side only: dot products via zip_with/aggregate inside codegen,
  one narrow pass + a small top-k sort.  The correctness baseline.
* ``ivf_topk`` — IVF-style scale path: deterministic coarse centroids
  (first C vectors by id), vectors assigned to nearest centroid at
  build time; queries probe only ``nprobe`` nearest cells.  At 10^9+
  vectors this turns a full scan into a partition-pruned fraction
  (cells are a partition column of the index table).
* ``ivf_topk_batch`` — the same IVF search for a whole query TABLE:
  probe cells per query via the broadcast-GEMM UDF, broadcast the
  exploded (query, cell) side into an equi-join on cell, per-query
  top-k via a rank-limit window (WindowGroupLimit partial top-k).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_cosine(df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding",
                out_col: str = "cosine", decimals: int = 6) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.withColumn(out_col, F.round(cos, decimals))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k by cosine (ties break on id asc).
    ``quantize`` rounds the cosine to that many decimals BEFORE
    ranking, making the selected set and tie-breaks engine-portable
    (two scores agreeing at the quantized precision resolve by id on
    every engine, instead of by sub-rounding float noise)."""
    scored = with_cosine(df, query_vec, vec_col)
    if quantize is not None:
        scored = scored.withColumn("cosine", F.round("cosine", quantize))
    return (
        scored.select(F.col(id_col), F.col("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _assign_udf(df: DataFrame, cmat: "np.ndarray", cnorm: "np.ndarray"):
    """Arrow-batched argmax over a broadcast centroid matrix — one
    (batch × cells) GEMM per batch, O(1) Catalyst expression size.
    Ties: round(cosine, 9) then lowest centroid index."""
    bc = df.sparkSession.sparkContext.broadcast((cmat, cnorm))

    @F.pandas_udf("int")
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cm, cn = bc.value
        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype="int32")
                continue
            vm = np.stack([np.asarray(x, dtype=np.float64) for x in s])
            vn = np.linalg.norm(vm, axis=1)
            scores = (vm @ cm.T) / (vn[:, None] * cn[None, :])
            yield pd.Series(np.argmax(np.round(scores, 9), axis=1).astype("int32"))

    return assign


def kmeans_centroids(
    df: DataFrame,
    num_cells: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List:
    """Deterministic spherical k-means for IVF coarse centroids.

    Init = the ``num_cells`` lowest-id vectors (RNG-free; ``num_cells``
    is clamped to the corpus size, and an empty corpus raises).  Each
    round assigns via the broadcast-GEMM argmax (map-only) and
    recomputes centroids from per-cell vector sums accumulated as ONE
    ``array<double>`` state per (partition, cell) inside a
    ``mapInPandas`` partial-sum (numpy scatter-add per Arrow batch),
    then reduced per cell — the shuffle is ``partitions × cells`` rows
    of one array column regardless of corpus size OR dimensionality.
    (The round-2 form shuffled ``dim`` named ``sum()`` columns: fine at
    dim ≤ ~256, codegen bloat at 1–4k dims; this form is dim-robust —
    tested at dim 512.)  Empty cells keep their previous centroid.
    Returns [(cell_index, centroid_vector)].  Float-sum ordering makes
    low bits run-dependent, so this is an index-build quality knob, not
    an oracle-checked operator — recall correctness is independent of
    centroid choice (probe=all ⇒ exact, tested)."""
    init = df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(num_cells).collect()
    if not init:
        raise ValueError("kmeans_centroids: input DataFrame is empty")
    num_cells = min(num_cells, len(init))
    cents = [[float(x) for x in r[1]] for r in init]
    dim = len(cents[0])
    v = F.col(vec_col).cast("array<double>")
    k = num_cells

    def partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            cells = pdf["cell"].to_numpy()
            np.add.at(sums, cells, vm)
            np.add.at(counts, cells, 1)
        nz = np.flatnonzero(counts)
        if len(nz):
            yield pd.DataFrame({"cell": nz.astype("int32"), "n": counts[nz],
                                "s": list(sums[nz])})

    def reduce_cell(key, pdf):
        s = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["s"]]).sum(axis=0)
        return pd.DataFrame({"cell": [key[0]], "n": [int(pdf["n"].sum())], "s": [s]})

    partial_schema = "cell int, n long, s array<double>"
    for _ in range(iters):
        cmat = np.asarray(cents, dtype=np.float64)
        cnorm = np.linalg.norm(cmat, axis=1)
        assign = _assign_udf(df, cmat, cnorm)
        assigned = df.select(assign(v).alias("cell"), v.alias("v"))
        agg = (
            assigned.mapInPandas(partial_sums, schema=partial_schema)
            .groupBy("cell")
            .applyInPandas(reduce_cell, schema=partial_schema)
        )
        rows = {int(r["cell"]): r for r in agg.collect()}
        new_cents = []
        for ci in range(num_cells):
            r = rows.get(ci)
            if r is None or r["n"] == 0:
                new_cents.append(cents[ci])
                continue
            mean = np.asarray(r["s"], dtype=np.float64) / r["n"]
            nrm = np.linalg.norm(mean)
            new_cents.append((mean / nrm if nrm > 0 else mean).tolist())
        cents = new_cents
    return [(ci, cents[ci]) for ci in range(num_cells)]


def build_ivf_index(
    df: DataFrame,
    num_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "first",
    kmeans_iters: int = 5,
) -> DataFrame:
    """Assign each vector to its nearest deterministic coarse centroid.

    ``strategy="first"`` (default): centroids = the ``num_cells``
    vectors with the smallest ids — deterministic, RNG-free, and
    reproducible by the DuckDB oracle.  ``strategy="kmeans"``: refine
    that init with :func:`kmeans_centroids` for balanced cells on
    clustered corpora (index-build quality knob; not oracle-checked —
    see kmeans_centroids).  Returns df + ``cell`` column; write
    partitioned by ``cell`` for pruning.

    Assignment is a map-only Arrow-batched argmax over a broadcast
    centroid matrix: one numpy matmul per batch, no shuffle, and no
    per-centroid Catalyst expression — expression size is O(1) in
    ``num_cells``, so 4k–64k cells (a 10^9-vector corpus) cost one
    (batch × cells) GEMM instead of a 64k-deep ``greatest`` nest.
    Ties break as round(cosine, 9) then lowest centroid index, matching
    the DuckDB oracle's rank expression.
    """
    if strategy == "kmeans":
        cents = kmeans_centroids(df, num_cells, kmeans_iters, id_col, vec_col)
    else:
        cents = [
            (int(r[0]), [float(x) for x in r[1]])
            for r in df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(num_cells).collect()
        ]
    if not cents:
        raise ValueError("build_ivf_index: input DataFrame is empty")
    cmat = np.asarray([c[1] for c in cents], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    assign = _assign_udf(df, cmat, cnorm)
    return df.withColumn("cell", assign(F.col(vec_col).cast("array<double>"))), cents


def _probe_udf(df: DataFrame, cmat: "np.ndarray", cnorm: "np.ndarray", nprobe: int):
    """Arrow-batched per-query probe-cell selection over a broadcast
    centroid matrix: one (batch × cells) GEMM per batch yields each
    query's ``nprobe`` nearest cell indices.  Ties: round(cosine, 9)
    then lowest centroid index — identical to ``_assign_udf`` and the
    driver-side ranking in ``ivf_topk``."""
    bc = df.sparkSession.sparkContext.broadcast((cmat, cnorm))

    @F.pandas_udf("array<int>")
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cm, cn = bc.value
        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            vm = np.stack([np.asarray(x, dtype=np.float64) for x in s])
            vn = np.linalg.norm(vm, axis=1)
            scores = np.round((vm @ cm.T) / (vn[:, None] * cn[None, :]), 9)
            # stable argsort on -scores: ties keep ascending cell index
            order = np.argsort(-scores, axis=1, kind="stable")
            yield pd.Series([row[:nprobe].astype("int32").tolist()
                             for row in order])

    return probe


def ivf_topk_batch(
    indexed: DataFrame,
    cents: List,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched IVF search: a whole TABLE of query vectors at once — the
    production shape for eval-set contamination sweeps and near-dup
    lookups, where queries arrive by the million, not one at a time.

    Plan (no driver-side loop over queries anywhere):

    1. each query picks its ``nprobe`` nearest cells via the broadcast-
       GEMM probe UDF (map-only over the query table);
    2. explode to (query, cell) and **broadcast** that small side into
       an equi-join on ``cell`` against the indexed corpus — the big
       side never shuffles, and only the probed fraction of the corpus
       is scored (with a cell-partitioned index table the non-probed
       cells are partition-pruned away entirely);
    3. per-query exact top-k: ``row_number()`` over (query_id, cosine
       desc, id asc) filtered to ``<= k`` — Spark's rank-limit pushdown
       (WindowGroupLimit) turns this into per-partition partial top-k
       before the shuffle, so the exchange carries at most
       ``k × queries`` rows per partition, not every scored candidate.

    Cosine is rounded to 6 before ranking (``with_cosine`` semantics);
    ties break on ascending ``id_col``.  Returns one row per
    (query_id, rank ≤ k): query_id, vec_id, cosine, rank.
    """
    from pyspark.sql.window import Window

    cmat = np.asarray([c[1] for c in cents], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    probe = _probe_udf(queries, cmat, cnorm, nprobe)
    qv = F.col(query_vec_col).cast("array<double>")
    qcells = queries.select(
        F.col(query_id_col),
        qv.alias("_qv"),
        F.explode(probe(qv)).alias("cell"),
    )
    joined = indexed.join(F.broadcast(qcells), "cell")
    v = F.col(vec_col).cast("array<double>")
    scored = joined.withColumn(
        "cosine", F.round(_dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv"))), 6))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_topk(
    indexed: DataFrame,
    cents: List,
    query_vec: Sequence[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells only, then exact top-k inside."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    q = [float(x) for x in query_vec]
    ranked = sorted(range(len(cents)), key=lambda ci: (-cos(cents[ci][1], q), ci))
    probe = ranked[:nprobe]
    pruned = indexed.where(F.col("cell").isin(probe))
    return cosine_topk(pruned, q, k=k, id_col=id_col, vec_col=vec_col)
