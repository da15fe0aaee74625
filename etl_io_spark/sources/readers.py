"""Source connectors (SURVEY.md §2.1, S1-S12).

The reference reads MS Access over ODBC (etl_io.py:135, 185-194), O*NET
tab-separated files (etl_io.py:763) and a CSV crosswalk (etl_io.py:894).
Spark-native equivalents, with the scale rules baked in:

  * explicit ``StructType`` everywhere — ``inferSchema`` is a full extra
    pass over the data, never acceptable at 100 TB (and schema drift is the
    reference's own documented hazard, etl_io.py:21-26);
  * JDBC reads take partitioning parameters (``partition_column`` /
    ``num_partitions``) so a big table scan parallelizes instead of
    funneling through one connection — the Spark analogue of the
    reference's single ODBC cursor;
  * predicates/column lists push into the source (Catalyst handles parquet
    & JDBC pushdown automatically once plans are declarative).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = "\t",
) -> DataFrame:
    """Tab-separated scan (S8; etl_io.py:763 ``pd.read_csv(sep='\\t')``)."""
    return (
        spark.read.option("sep", sep)
        .option("header", header)
        .schema(schema)
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S9; etl_io.py:894). ``schema=None`` infers — acceptable
    only for small dims like the crosswalk; pass a schema for facts."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    multiline: bool = False,
) -> DataFrame:
    """NDJSON / JSON-lines scan with a REQUIRED explicit schema — at scale,
    schema inference over JSON is a full extra pass of the data, and
    multiline mode forces whole-file (unsplittable) reads, so the default
    is line-delimited (one record per line, splittable)."""
    return (
        spark.read.option("multiLine", multiline).schema(schema).json(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink (line-delimited; splittable on re-read)."""
    df.write.mode(mode).json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: Mapping[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC table scan (S1/S2; replaces pypyodbc at etl_io.py:135).

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-partitioned queries in parallel; without them the scan is a
    single connection (dims only)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    properties: Mapping[str, str] | None = None,
) -> None:
    """JDBC sink (S13/S14; the reference's ``to_sqlite3`` / planned
    ``to_db``, etl_io.py:203-219, 947)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Parquet sink with optional partition columns — the native
    at-scale sink; partition keys become directory pruning for readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def copy_database(
    cat, target_dir: str, tables: Sequence[str] | None = None
) -> list[str]:
    """Whole-DB copy (S13; etl_io.py:203-219 loops tables → sqlite): write
    every catalog table to parquet under ``target_dir``. Returns the
    written table names."""
    names = list(tables) if tables else cat.tables()
    for name in names:
        write_parquet(cat.table(name), f"{target_dir}/{name}.parquet")
    return names


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC scan (columnar, vectorized, predicate-pushdown like parquet —
    Spark's second native columnar format; the at-scale choice when the
    lake is Hive/ORC). Schema optional: ORC carries its own like parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink with optional partition columns (directory pruning on read)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def union_evolved(frames: Sequence[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted (the reference's per-year table
    problem, etl_io.py:21-26): columns are matched BY NAME and columns
    missing from any input surface as nulls — the append path when a new
    source generation adds fields. Order-insensitive to column position.
    Incompatible types (e.g. string vs map) fail the union analysis; note
    that compatible numeric types still widen implicitly (int->long,
    int->double) per Spark's union coercion rules."""
    if not frames:
        raise ValueError("union_evolved needs at least one input frame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_avro(spark, path: str):
    """Avro source — passthrough to the built-in-but-external avro module
    (requires the spark-avro jar on the classpath; this container ships
    none, so the call fails fast with Spark's own deploy hint — honest
    env-gating, same policy as the JDBC sink)."""
    return spark.read.format("avro").load(path)
