"""Site-level boilerplate removal — corpus-frequency block dedup.

The reference engine strips boilerplate *within* one document
(selector-driven removal + link/text-density heuristics,
extract.zig's contract).  A 100-TB corpus enables the complementary,
inherently-distributed signal a single-node parser cannot compute:
a text block that repeats across most pages of a HOST (cookie
banners, footers, nav crumbs rendered as text, share widgets) is
chrome, whatever its local density looks like.  This module is that
pipeline, Spark-first:

1. ``text_blocks_udf`` (map-only Arrow kernel pass): outermost
   block-level elements' innerText in document order — one parse per
   document, one array out, fan-out via JVM ``posexplode``.
2. block fingerprint = ``md5`` of the whitespace-collapsed text
   (JVM-side column).
3. per-``(host, fingerprint)`` document frequency — ONE hash-aggregate
   shuffle of the exploded blocks (map-side partial:
   ``countDistinct`` expands to two-phase distinct aggregation).
4. per-host page counts — an aggregate over the DOC frame (one row
   per host; tiny, broadcast back).
5. blocks whose doc-frequency ratio ≥ ``threshold`` (and absolute
   count ≥ ``min_docs``) are boilerplate; survivors reassemble per
   doc with ``array_sort(collect_list(struct(pos, text)))`` — the
   second and last shuffle, on ``doc_id``.

Scale notes: both shuffles key on high-cardinality columns
((host, fp) and doc_id) so they salt-free rebalance; the boilerplate
table is ~(hosts x frequent-blocks) — orders of magnitude smaller
than the corpus — and joins back to blocks by (host, fp) equi-join
(AQE broadcasts it when small).  Hot hosts concentrate a (host, fp)
key only as far as one row per distinct block after partial
aggregation, so a 10^8-page host is still fine.

Block definition (pinned by tests): elements matching
``BLOCK_SELECTOR`` with NO matching ancestor (outermost wins — a
``blockquote > p`` contributes one block, not two), innerText
whitespace-normalized, empty blocks dropped.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..kernel.htmlparse import parse
from ..kernel.matcher import query_all
from ..kernel.selector import compile_selector
from ..kernel.text import inner_text
from .html_ops import _series_map

#: block-level elements considered candidate boilerplate units.  td is
#: excluded on purpose (tables fragment into per-cell false positives);
#: li is included (nav lists are the dominant chrome shape).
BLOCK_SELECTOR = "p, h1, h2, h3, h4, h5, h6, li, pre, blockquote, dt, dd"

BLOCKS_TYPE = ArrayType(
    StructType([
        StructField("pos", IntegerType(), False),
        StructField("text", StringType(), False),
    ])
)


def text_blocks_udf(selector: str = BLOCK_SELECTOR):
    """Outermost ``selector`` matches' innerText in document order as
    ``array<struct<pos,text>>`` — one kernel parse per document,
    map-only.  ``pos`` numbers surviving (non-empty) blocks."""
    sel = compile_selector(selector)

    def one(h: str):
        dom = parse(h.encode("utf-8"))
        idxs = query_all(dom, sel)
        matched = set(idxs)
        out: List[tuple] = []
        parent = dom.parent
        for i in idxs:
            p = parent[i]
            while p > 0 and p not in matched:
                p = parent[p]
            if p in matched:
                continue  # nested inside another block: outermost wins
            t = inner_text(dom, i, True).decode("utf-8", "replace")
            if t:
                out.append((len(out), t))
        return out

    @F.pandas_udf(BLOCKS_TYPE)
    def udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        yield from _series_map(it, one)
    return udf


def block_frame(df: DataFrame, html_col: str = "html",
                doc_col: str = "doc_id", host_col: str = "host",
                selector: str = BLOCK_SELECTOR) -> DataFrame:
    """Exploded block frame: (doc, host, pos, text, fp)."""
    blocks = text_blocks_udf(selector)(F.col(html_col))
    return (
        df.select(doc_col, host_col, F.explode(blocks).alias("b"))
        .select(doc_col, host_col,
                F.col("b.pos").alias("pos"), F.col("b.text").alias("text"))
        .withColumn("fp", F.md5(F.col("text")))
    )


def boilerplate_blocks(blocks: DataFrame, doc_totals: DataFrame,
                       doc_col: str = "doc_id", host_col: str = "host",
                       threshold: float = 0.5,
                       min_docs: int = 2) -> DataFrame:
    """Per-host block fingerprints whose document frequency crosses
    the boilerplate bar: df_docs ≥ min_docs AND df_docs/host_docs ≥
    threshold.  ``doc_totals`` must be (host, host_docs)."""
    per_fp = (blocks.groupBy(host_col, "fp")
              .agg(F.countDistinct(doc_col).alias("df_docs")))
    return (per_fp.join(doc_totals, host_col)
            .where((F.col("df_docs") >= min_docs)
                   & (F.col("df_docs") >= F.col("host_docs") * threshold))
            .select(host_col, "fp", "df_docs", "host_docs"))


def remove_boilerplate(df: DataFrame, html_col: str = "html",
                       doc_col: str = "doc_id", host_col: str = "host",
                       threshold: float = 0.5, min_docs: int = 2,
                       selector: str = BLOCK_SELECTOR,
                       joiner: str = "\n") -> DataFrame:
    """Corpus-frequency main-content extraction: drop every block that
    is host-level boilerplate, reassemble the rest in document order.
    Returns (doc, host, main_text, n_blocks_kept, n_blocks_dropped).

    Documents whose blocks are ALL boilerplate still appear (empty
    main_text, n_blocks_kept = 0) — dropping pages silently would skew
    downstream corpus accounting.  (Documents with NO candidate blocks
    at all have nothing to reassemble and are absent from the output —
    join back to the source frame when completeness matters.)

    Global (cross-host) frequency dedup — the CCNet-style "drop lines
    that repeat anywhere in the corpus" — is the same pipeline with a
    constant host column (``F.lit("")``); the per-host form is the
    default because chrome is overwhelmingly site-scoped and a global
    threshold on a 10^12-page corpus would only catch universal
    strings.
    """
    blocks = block_frame(df, html_col, doc_col, host_col, selector)
    totals = (df.groupBy(host_col)
              .agg(F.countDistinct(doc_col).alias("host_docs")))
    boiler = boilerplate_blocks(blocks, totals, doc_col, host_col,
                                threshold, min_docs)
    tagged = (blocks.join(boiler.select(host_col, "fp")
                          .withColumn("is_boiler", F.lit(True)),
                          [host_col, "fp"], "left"))
    kept = F.filter(
        F.array_sort(F.collect_list(
            F.when(F.col("is_boiler").isNull(),
                   F.struct(F.col("pos"), F.col("text"))))),
        lambda s: s.isNotNull())
    return (
        tagged.groupBy(doc_col, host_col)
        .agg(
            kept.alias("_kept"),
            F.count(F.lit(1)).alias("_n_total"),
        )
        .select(
            doc_col, host_col,
            F.array_join(F.transform(F.col("_kept"), lambda s: s.text),
                         joiner).alias("main_text"),
            F.size("_kept").cast("int").alias("n_blocks_kept"),
            (F.col("_n_total") - F.size("_kept")).cast("int")
            .alias("n_blocks_dropped"),
        )
    )
