"""CSV/JSON file sources with explicit schemas (SURVEY.md §2.2
"CSV / JSON scan with schema").

The driver testdata ships parquet only, so these readers are exercised
against deterministic CSV/JSON copies materialized once per (sf, table)
under a cache dir — written by Spark itself, read back with the
explicit schema (never inference: at 100 TB schema inference is a full
extra pass).

The reference's only sources are network ones (Pulsar; SURVEY.md
§2.1.1 notes zero file-format scans), so this is engine capability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..schemas import TABLE_SCHEMAS

CACHE_ROOT = "/tmp/spark_graft_file_sources"


def _cache_dir(sf_dir: str, name: str, fmt: str) -> str:
    tag = sf_dir.rstrip("/").replace("/", "_")
    return os.path.join(CACHE_ROOT, tag, f"{name}.{fmt}")


def _materialize(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    """Write the parquet table as CSV/JSON/ORC/gzip-JSONL once
    (idempotent via _SUCCESS)."""
    out = _cache_dir(sf_dir, name, fmt)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, name)
        writer = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            # Spark's CSV WRITER defaults ignore{Leading,Trailing}
            # WhiteSpace=true — it silently TRIMS field whitespace on
            # write (the csv-dialect fuzz lane caught 'trailing space '
            # round-tripping as 'trailing space'). Preserve bytes.
            writer.option("header", "true") \
                .option("ignoreLeadingWhiteSpace", "false") \
                .option("ignoreTrailingWhiteSpace", "false").csv(out)
        elif fmt == "orc":
            writer.orc(out)
        elif fmt == "jsonl_gz":
            writer.option("compression", "gzip").json(out)
        else:
            writer.json(out)
    return out


def read_csv_with_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = _materialize(spark, sf_dir, name, "csv")
    return (spark.read.schema(TABLE_SCHEMAS[name])
            .option("header", "true").csv(path))


def read_json_with_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = _materialize(spark, sf_dir, name, "json")
    return spark.read.schema(TABLE_SCHEMAS[name]).json(path)


def read_jsonl_gzip_with_schema(spark: SparkSession, sf_dir: str,
                                name: str) -> DataFrame:
    """Gzip-compressed JSON-lines scan — the wire format most training
    corpora actually arrive in (.jsonl.gz shards). Spark decompresses
    by extension transparently; the schema is declared, never inferred.

    Scale note: gzip is NOT splittable — each .gz file is one scan
    task, however large. The 100 TB posture is therefore many
    moderate shards (file count >= cluster cores, each <~1 GB) or a
    splittable codec (bzip2, or zstd with seekable framing); a single
    monolithic .gz serializes the whole scan onto one core.
    """
    path = _materialize(spark, sf_dir, name, "jsonl_gz")
    return spark.read.schema(TABLE_SCHEMAS[name]).json(path)


def read_orc(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """ORC scan. Unlike CSV/JSON the schema comes from the ORC footer
    (exact types, no inference pass); ORC gets the same pushdown/
    pruning treatment as parquet from the vectorized reader."""
    path = _materialize(spark, sf_dir, name, "orc")
    return spark.read.orc(path)


def read_xml_with_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Native XML scan (Spark 4 built-in `xml` format, SPARK-44265).

    Materialized once as row-tagged XML, read back with the explicit
    table schema — like CSV/JSON, inference would cost a full extra
    pass at 100 TB, so the schema is always declared.
    """
    out = _cache_dir(sf_dir, name, "xml")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, name)
        (df.coalesce(1).write.mode("overwrite").format("xml")
           .option("rootTag", name).option("rowTag", "row").save(out))
    return (spark.read.schema(TABLE_SCHEMAS[name])
            .format("xml").option("rowTag", "row").load(out))


def read_text_lines(spark: SparkSession, sf_dir: str, name: str,
                    cols: list[str], sep: str = "|") -> DataFrame:
    """Line-oriented text scan (`spark.read.text` -> one `value` column).

    Materializes the table once as sep-delimited lines written by
    `df.write.text`, then reads it back as raw lines. This is the
    unstructured-ingest path: at 100 TB, raw text/log files are read
    exactly like this (splittable by line, one scan task per 128 MB
    split) and parsed with narrow per-row expressions — the same shape
    as the reference's fixed-width message parse
    (DataStreamProcessingJob.java:53-54).
    """
    out = _cache_dir(sf_dir, name, "txt")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, name)
        line = [F.col(c).cast("string") for c in cols]
        (df.select(F.concat_ws(sep, *line).alias("value"))
           .coalesce(1).write.mode("overwrite").text(out))
    return spark.read.text(out)


def read_binary_files(spark: SparkSession, sf_dir: str,
                      max_doc_id: int = 100) -> DataFrame:
    """`binaryFile` source over per-document payload files.

    Materializes each document's text as an individual `doc_<id>.bin`
    file (driver-side loop — test-fixture setup only, never a data
    path), then reads the directory back with Spark's built-in
    `binaryFile` format: columns (path, modificationTime, length,
    content binary). This is the multimodal-ingest scan: at 100 TB the
    same reader pulls image/audio blobs straight from an object store,
    one file per row, with pathGlobFilter pruning at listing time.
    """
    out = _cache_dir(sf_dir, f"documents_bin_{max_doc_id}", "bin")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        rows = (load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") <= max_doc_id)
                .select("doc_id", "text").collect())
        for r in rows:
            with open(os.path.join(out, f"doc_{r['doc_id']:05d}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))
        with open(marker, "w"):
            pass
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin").load(out))


def read_csv_with_badrecords(spark: SparkSession, sf_dir: str,
                             name: str = "supplier",
                             n_bad: int = 5) -> DataFrame:
    """CSV scan with a bad-record side channel (PERMISSIVE mode).

    Materializes the table as CSV with n_bad deterministic malformed
    lines appended, then reads it back with an explicit schema plus a
    `_corrupt_record` column: well-formed rows parse to typed columns,
    malformed rows land whole in the side channel instead of failing
    the task. The reference has NO bad-record path — a garbage header
    crashes the job (DataStreamProcessingJob.java:60, Long.parseLong);
    at 100 TB a single bad line must never kill a 1000-executor scan.
    """
    from pyspark.sql import types as T
    good = _materialize(spark, sf_dir, name, "csv")
    out = _cache_dir(sf_dir, f"{name}_bad{n_bad}", "csv")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        import shutil
        part = next(f for f in os.listdir(good)
                    if f.startswith("part-") and f.endswith(".csv"))
        dst = os.path.join(out, "data.csv")
        shutil.copy(os.path.join(good, part), dst)
        with open(dst, "a") as f:
            for i in range(n_bad):
                f.write(f"BAD_ROW_{i},not-a-number\n")
        with open(marker, "w"):
            pass
    schema = T.StructType(
        list(TABLE_SCHEMAS[name].fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    return (spark.read.schema(schema)
            .option("header", "true").option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(out))
