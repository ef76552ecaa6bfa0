"""Table IO abstraction: Iceberg when available, parquet fallback.

The production target (north rule) is Iceberg tables of transcripts
partitioned by ``bucket(N, conv_id)``.  This sandbox ships no Iceberg
runtime jar, so every entry point takes either an Iceberg table
identifier (``catalog.db.table``) or a filesystem path; Iceberg use is
gated behind a capability probe and everything degrades to plain
parquet with identical semantics.  The pipeline's idempotency story
maps 1:1:

| Concern | Iceberg | Parquet fallback (what tests exercise) |
|---|---|---|
| partition layout | ``bucket(N, conv_id)`` hidden partitioning | explicit ``bucket`` column + ``partitionBy("bucket")`` |
| idempotent bucket rewrite | ``overwritePartitions()`` (dynamic) | ``partitionOverwriteMode=dynamic`` |
| commit record | Iceberg snapshot + control rows | control table rows only |
| resume | anti-join control rows, same either way | same |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/runtime is on the classpath."""
    try:
        # py4j resolves missing packages lazily (truthy JavaPackage), so
        # force real classloading.
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


_FILE_EXTS = {
    "parquet", "orc", "csv", "json", "jsonl", "avro", "txt", "db",
    "tsv", "gz", "zst", "snappy",
}


def _is_table_ident(src: str) -> bool:
    """Catalog identifier (``catalog.db.table`` / ``db.table``), not a
    path: no slashes, ≥2 identifier-shaped dot-separated parts, and the
    last part isn't a known file extension (so relative file names like
    ``out.parquet`` or ``ctl.db`` never route to a catalog)."""
    if "/" in src or "\\" in src:
        return False
    parts = src.split(".")
    if len(parts) < 2 or parts[-1].lower() in _FILE_EXTS:
        return False
    return all(p and (p[0].isalpha() or p[0] == "_")
               and all(c.isalnum() or c == "_" for c in p) for p in parts)


def _read_iceberg(spark: SparkSession, src: str) -> DataFrame:
    """Iceberg-branch reader (seam for contract tests: no runtime jar
    ships in this sandbox, so tests mock this + the probe and assert
    routing/semantics parity with the parquet branch)."""
    return spark.read.format("iceberg").load(src)


def _write_iceberg(df: DataFrame, dst: str, mode: str) -> None:
    """Iceberg-branch writer: ``overwritePartitions`` = atomic dynamic
    partition replace — the contract the parquet fallback must match
    (tests/test_catalog_jobs.py pins both against a plain-Python
    model of that contract)."""
    w = df.writeTo(dst)
    if mode == "overwrite":
        w.overwritePartitions()
    else:
        w.append()


def read_table(spark: SparkSession, src: str) -> DataFrame:
    """Read transcripts from an Iceberg table identifier or a parquet
    path; Catalyst gets partition pruning + column pruning either way."""
    if _is_table_ident(src) and iceberg_available(spark):
        return _read_iceberg(spark, src)
    return spark.read.parquet(src)


def write_table(
    df: DataFrame,
    dst: str,
    partition_col: str = "bucket",
    mode: str = "overwrite",
) -> None:
    """Write partitioned output idempotently.

    Iceberg identifier → ``writeTo(...).overwritePartitions()`` (atomic
    dynamic partition replace); path → parquet ``partitionBy`` with the
    per-write ``partitionOverwriteMode=dynamic`` option, so overwrite
    replaces ONLY the partitions present in ``df`` regardless of the
    session conf — the Iceberg-parity contract holds unconditionally
    (a static overwrite here would silently drop untouched partitions
    for any caller that didn't set the session conf).
    """
    spark = df.sparkSession
    if _is_table_ident(dst) and iceberg_available(spark):
        _write_iceberg(df, dst, mode)
        return
    (df.write.mode(mode)
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(dst))


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts(spark: SparkSession, src: str, fmt: str = "parquet") -> DataFrame:
    """Read the canonical transcript table from any supported format
    with the schema ENFORCED (never inferred — schema drift in a
    100 TB ingest should fail loudly at the scan, not silently retype
    a column).  ``fmt``: parquet (default, also Iceberg idents via
    :func:`read_table`) | orc | json (newline-delimited) | csv (with
    header) | xml (Spark 4 built-in source, ``rowTag=turn``).
    """
    if fmt in ("parquet", "orc"):
        df = read_table(spark, src) if fmt == "parquet" else spark.read.orc(src)
        # project + cast to the canonical schema (order + types)
        names = [c.split()[0] for c in TRANSCRIPT_DDL.split(",")]
        types = [c.split()[1] for c in TRANSCRIPT_DDL.split(",")]
        from pyspark.sql import functions as F
        return df.select(*[F.col(n).cast(t).alias(n) for n, t in zip(names, types)])
    if fmt == "json":
        return spark.read.schema(TRANSCRIPT_DDL).json(src)
    if fmt == "csv":
        # nullValue sentinel preserves empty strings (Spark CSV reads
        # "" as null by default, which would corrupt the tool column)
        return (spark.read.schema(TRANSCRIPT_DDL)
                .option("header", "true")
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
                .option("nullValue", "\\N")
                .option("emptyValue", "")
                .csv(src))
    if fmt == "xml":
        # Built-in XML source (Spark 4).  The writer XML-escapes the
        # HTML-laden text column and the reader unescapes it, so markup
        # round-trips exactly; empty elements come back as "" and
        # absent elements as NULL under the enforced schema (verified
        # in tests/test_catalog_jobs.py).
        return (spark.read.schema(TRANSCRIPT_DDL)
                .format("xml").option("rowTag", "turn").load(src))
    raise ValueError(f"unsupported transcript format: {fmt}")
