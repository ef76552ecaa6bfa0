"""Corpus-preparation operators: deterministic holdout splits and
sequence packing.

Beyond-the-reference training-data operators (same family as
operators/dedup.py and operators/curate.py): before a corpus reaches
a trainer it needs (a) a stable train/val/test assignment that never
moves a document between splits as the corpus grows, and (b) packing
of variable-length documents into fixed-token-budget training
sequences.

Both are pure DataFrame compositions, no Python kernels:

* ``split_assign`` buckets a stable content-independent hash of the
  id — ``md5`` (shared bit-exactly by every engine, unlike
  ``xxhash64``) → first 8 hex chars → int → mod ``buckets`` — and
  maps bucket ranges to named splits.  Map-only: no shuffle at all;
  adding documents never reassigns existing ones (the classic
  hash-split contract).
* ``pack_sequences`` implements concatenate-and-chop packing (the
  standard GPT-style pretraining layout: stream documents in a
  deterministic order, cut every ``budget`` tokens).  The stream is
  sharded into ``n_buckets`` independent packing streams by id hash
  so packing parallelizes; within a bucket a running-sum window over
  (bucket) ordered by id yields each document's start offset, its
  sequence number, and whether it straddles a cut.  One shuffle on
  the bucket key.

Scale notes: ``split_assign`` is embarrassingly parallel.
``pack_sequences`` shuffles once on ``n_buckets`` uniform hash keys;
each bucket's window is an independent sorted stream, so width scales
with ``n_buckets`` (pick ≥ cluster cores; 4096 in production matches
the pipeline's bucket count).  Nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def hash_bucket(id_col: str, buckets: int) -> Column:
    """Stable engine-portable bucket in [0, buckets): first 8 hex
    chars of md5(id-as-string) as an integer, mod ``buckets``.
    DuckDB twin: ``('0x' || substr(md5(cast(id as varchar)),1,8))
    ::bigint % buckets``."""
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(buckets))


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[Tuple[str, float]] = (
        ("train", 0.90), ("val", 0.05), ("test", 0.05),
    ),
    buckets: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic holdout assignment: hash-bucket each id and map
    contiguous bucket ranges to the named splits (fractions must sum
    to 1; ranges are [floor(cum*buckets) boundaries, so every bucket
    lands in exactly one split).  Map-only, no shuffle; a document's
    split never changes as the corpus grows."""
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1")
    b = hash_bucket(id_col, buckets)
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        bound = int(round(cum * buckets))
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn(out_col, expr)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Concatenate-and-chop packing plan: shard documents into
    ``n_buckets`` streams by id hash, order each stream by id, and
    compute every document's position in the chopped token stream.

    Returns one row per document: ``bucket``, id, ``n_tokens``
    (whitespace tokens, same counter as textstats), ``start_offset``
    (tokens before it in its stream), ``seq_id`` (=
    start_offset // budget — the training sequence its first token
    lands in), and ``crosses_cut`` (1 when the document straddles a
    sequence boundary and the loader must span two sequences).
    """
    b = hash_bucket(id_col, n_buckets).alias("bucket")
    toks = token_count(text_col).cast("long").alias("n_tokens")
    base = docs.select(b, F.col(id_col), toks)
    w = (
        Window.partitionBy("bucket").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_offset")
    out = base.select("bucket", id_col, "n_tokens", start)
    seq = (F.col("start_offset") - F.col("start_offset") % budget) / budget
    end_seq = ((F.col("start_offset") + F.col("n_tokens") - 1)
               - (F.col("start_offset") + F.col("n_tokens") - 1) % budget) \
        / budget
    return out.select(
        "bucket", id_col, "n_tokens", "start_offset",
        seq.cast("long").alias("seq_id"),
        F.when(F.col("n_tokens") > 0,
               (end_seq > seq).cast("int")).otherwise(0).alias("crosses_cut"),
    )


def split_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[Tuple[str, float]] = (
        ("train", 0.90), ("val", 0.05), ("test", 0.05),
    ),
    buckets: int = 1000,
) -> DataFrame:
    """Per-split document/token accounting (the sanity table every
    split job prints): counts and whitespace-token totals."""
    s = split_assign(docs, id_col, splits, buckets)
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text").cast("long")).alias("n_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (RAG / long-context prep):
    split each document into windows of ``chunk`` whitespace tokens
    overlapping by ``overlap``, emitting ``(id, n_tokens, chunk_idx,
    chunk_len, chunk_text)``.

    Window starts step by ``chunk - overlap``; the number of windows
    is ``max(1, ceil((n_tokens - overlap) / step))`` so every token is
    covered, the final (possibly short) window is kept, and an empty
    document still yields one empty chunk.

    Scale shape: pure row expansion — ``explode(sequence(...))`` over
    a per-row computed window count plus ``slice`` on the cached token
    array, all in the scan projection.  No shuffle, no Python; output
    row count is ~``n_tokens / step`` per doc, bounded and uniform.
    """
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap({overlap}) < chunk({chunk})")
    step = chunk - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n.cast("double") - F.lit(float(overlap))) / F.lit(float(step))),
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.cast("long").alias("n_tokens"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
            .alias("chunk_idx"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * step + 1, chunk)
    return base.select(
        id_col,
        "n_tokens",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).cast("int").alias("chunk_len"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
