"""Table catalog over a directory of parquet files.

Spark-native analogue of the reference's eager catalog layer
(etl_io.py:114-138: ``connect`` loads table list, per-table column titles and
per-column value labels up front). Here the catalog is lazy and metadata-only:
we register each ``<dir>/<name>.parquet`` as a temp view so both the DataFrame
API and ``spark.sql`` see the same names, and expose the catalog queries
(`tables`, `columns`) from Spark's own catalog instead of side dicts.

At 100 TB the same class points at an object-store prefix / metastore —
nothing here materializes data on the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (path, mtime) -> timestamp[ns] column names; see _nanos_cols.
_NANOS_CACHE: dict[tuple[str, float], list[str]] = {}

#: Canonical driver test tables (TESTDATA.md).
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class TableCatalog:
    """Registry of named parquet tables under one root directory.

    Mirrors `IPEDSHandler.connect` + `get_tables`/`get_varnames`
    (etl_io.py:36-138) with Spark's catalog: views are registered once,
    reads stay lazy, and schema queries hit parquet footers only.
    """

    spark: SparkSession
    root: str
    register_views: bool = True
    _tables: dict[str, str] = field(default_factory=dict)
    # per-catalog memo of the base scan DataFrames: plans are immutable,
    # so handing every caller the same lazy scan object is semantically
    # identical while skipping the JVM schema probe + footer read that
    # otherwise cost ~50 ms per table() call (queries call table() 1-4
    # times each — this was a visible share of the per-query driver floor)
    _dfs: dict[str, DataFrame] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # the catalog must work on ANY session (the driver passes its own):
        # nanosecond parquet timestamps need this runtime-settable conf,
        # and oracle parity assumes UTC timestamp rendering.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        self.spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
        )
        # cached subplans bypass AQE coalescing, so an untouched 200-default
        # would pin 200-task stages even on tiny data; respect any value the
        # user set explicitly.
        if self.spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            cores = os.cpu_count() or 8
            self.spark.conf.set("spark.sql.shuffle.partitions", str(min(32, cores)))
        for fname in sorted(os.listdir(self.root)):
            if fname.endswith(".parquet"):
                name = fname[: -len(".parquet")]
                self._tables[name] = os.path.join(self.root, fname)
        if self.register_views:
            for name in self._tables:
                self.table(name).createOrReplaceTempView(name)

    # -- catalog queries (S5/S6 analogues) ---------------------------------
    def tables(self) -> list[str]:
        """Table list; reference: ``get_tables`` etl_io.py:36-53."""
        return sorted(self._tables)

    def columns(self, name: str) -> list[str]:
        """Column names; reference: ``get_varnames`` etl_io.py:55-83."""
        return self.table(name).columns

    def path(self, name: str) -> str:
        return self._tables[name]

    # -- scans (S2 analogue) -------------------------------------------------
    def table(self, name: str) -> DataFrame:
        """Lazy projected scan of one table (etl_io.py:156-201).

        Nanosecond parquet timestamps (unsupported by Spark's vectorized
        reader) are read as long (``nanosAsLong``, session.py) and floor-
        converted to microsecond timestamps here — a codegen'd expression,
        still lazy/distributed. Oracles cast the same columns with
        ``CAST(x AS TIMESTAMP)`` (ns->us floor) for bit-parity.
        """
        if name not in self._tables:
            raise KeyError(
                f"unknown table {name!r}; available: {self.tables()}"
            )
        cached = self._dfs.get(name)
        if cached is not None:
            return cached
        path = self._tables[name]
        df = self.spark.read.parquet(path)
        for c in self._nanos_cols(path):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        self._dfs[name] = df
        return df

    def table_stream(
        self, name: str, source_dir: str, max_files_per_trigger: int = 1
    ) -> DataFrame:
        """Streaming scan with the same schema/timestamp semantics as
        ``table(name)``: reads ``source_dir`` as a file stream using the
        raw parquet schema (nanos as long), then applies the identical
        lazy ns->us conversion — so batch and stream plans are twins."""
        path = self._tables[name]
        raw_schema = self.spark.read.parquet(path).schema
        df = (
            self.spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        for c in self._nanos_cols(path):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df

    @staticmethod
    def _nanos_cols(path: str) -> list[str]:
        """Columns stored as timestamp[ns] (footer-only check, no data read).

        Accepts single-file tables (driver testdata) and Spark-written
        parquet DIRECTORIES, including partitionBy layouts (part files
        nested under key=value subdirectories) — the first part file found
        by a recursive walk represents the table, since Spark writes a
        uniform schema. Raises if a directory holds no part file at all,
        rather than silently skipping the ns->us conversion.

        Results are memoized per (path, mtime): the footer never changes
        under an unchanged mtime, and direct callers (``table_stream``)
        otherwise re-read it per call."""
        try:
            key = (path, os.path.getmtime(path))
        except OSError:
            key = None
        if key is not None and key in _NANOS_CACHE:
            return _NANOS_CACHE[key]
        cols = TableCatalog._nanos_cols_uncached(path)
        if key is not None:
            _NANOS_CACHE[key] = cols
        return cols

    @staticmethod
    def _nanos_cols_uncached(path: str) -> list[str]:
        if os.path.isdir(path):
            part = None
            for dirpath, _dirnames, filenames in sorted(os.walk(path)):
                cands = sorted(
                    f
                    for f in filenames
                    if f.endswith(".parquet") and not f.startswith(("_", "."))
                )
                if cands:
                    part = os.path.join(dirpath, cands[0])
                    break
            if part is None:
                raise FileNotFoundError(
                    f"no .parquet part file under {path!r}; cannot determine "
                    "timestamp physical types"
                )
            path = part
        # physical INT96 (legacy Spark writes) also surfaces as
        # timestamp[ns] in arrow, but Spark reads INT96 as TIMESTAMP
        # natively — only true INT64-nanos columns need the long->us
        # conversion.
        meta = _pq.read_metadata(path)
        int96 = {
            meta.schema.column(i).name
            for i in range(meta.num_columns)
            if meta.schema.column(i).physical_type == "INT96"
        }
        schema = _pq.read_schema(path)
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns") and f.name not in int96
        ]

    def sql(self, query: str) -> DataFrame:
        """Raw-SQL passthrough (S4; etl_io.py:194-198) — a real parser
        (Catalyst) instead of the reference's ``split('FROM ')`` hack."""
        return self.spark.sql(query)
