"""Join operators (SURVEY.md §2.3) + the crosswalk ``translate`` pipeline.

The reference's joins are pandas ``merge`` calls (etl_io.py:385-386, 936-939)
plus a collect-IDs-into-IN-list pattern (etl_io.py:354-357). Spark-first
re-expression:

  * dim joins take a ``F.broadcast`` hint when the dim is known-small (J1) —
    at 100 TB the fact side never shuffles for a broadcast join;
  * the IN-list pattern becomes a ``left_semi`` join (J4): the filter stays
    on the cluster, no driver round-trip, and AQE can still turn it into a
    broadcast;
  * ``translate`` (Rosetta, etl_io.py:898-941) keeps pandas merge semantics:
    ``how`` passthrough including Spark's extra ``left_semi``/``left_anti``,
    duplicate-key row multiplication (inner-join semantics are identical),
    and the list-column explode done natively (F6) instead of a row loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact × dimension equi-join (J1; etl_io.py:385-386).

    ``broadcast_dim=True`` hints the dim side; harmless when AQE would have
    chosen broadcast anyway, decisive when stale stats would have picked a
    shuffle join on a 100 TB fact table.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join_filter(
    fact: DataFrame, keys: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """Filter fact rows to those with a key match (J4).

    Replaces the reference's collect-UNITIDs-then-IN-list round trip
    (etl_io.py:354-357): the key set never leaves the executors.
    """
    return fact.join(keys, on=on, how="left_semi")


def anti_join(
    fact: DataFrame, keys: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """Rows with NO key match — the complement the reference couldn't
    express without a second round trip."""
    return fact.join(keys, on=on, how="left_anti")


def parse_list_column(
    df: DataFrame, col: str, out: str | None = None
) -> DataFrame:
    """Parse a stringified Python/JSON list column into a real array.

    F6; the reference stores ``cip_2020`` as ``"['11.0101', '11.0201']"``
    and parses with ``ast.literal_eval`` in a row loop (etl_io.py:924-934).
    Here: normalize quotes, ``from_json`` to ``array<string>`` — pure
    codegen, no Python.
    """
    out = out or col
    normalized = F.regexp_replace(F.col(col), "'", '"')
    return df.withColumn(out, F.from_json(normalized, ArrayType(StringType())))


def explode_list(
    df: DataFrame, col: str, out: str | None = None, keep_empty: bool = False
) -> DataFrame:
    """One output row per array element (F6 second half; etl_io.py:927-934).

    ``keep_empty=True`` uses ``explode_outer`` so rows with null/empty lists
    survive with a null element (the reference's loop drops them — default
    matches the reference).
    """
    out = out or col
    fn = F.explode_outer if keep_empty else F.explode
    return df.withColumn(out, fn(F.col(col) if out != col else F.col(col)))


def translate(
    data: DataFrame,
    crosswalk: DataFrame,
    left: str,
    right: str,
    data_2: DataFrame | None = None,
    how: str = "inner",
    list_col: str | None = None,
) -> DataFrame:
    """Crosswalk translation (Q7 ``Rosetta.translate``, etl_io.py:898-941).

    Pipeline: project crosswalk to (left, right) → dropDuplicates → dropna →
    (optionally parse+explode a stringified list column) → join ``data`` on
    ``left`` → optionally chain-join ``data_2`` on ``right`` (J2/J3).

    The crosswalk is broadcast — it is a small code-mapping dim by
    construction; the two fact sides therefore never co-shuffle, and
    Catalyst reorders the chained join freely.
    """
    xw = crosswalk.select(left, right)
    if list_col == right:
        xw = parse_list_column(xw, right)
        xw = xw.withColumn(right, F.explode(right))
    elif list_col == left:
        xw = parse_list_column(xw, left)
        xw = xw.withColumn(left, F.explode(left))
    xw = xw.dropDuplicates([left, right]).na.drop()
    out = data.join(F.broadcast(xw), on=left, how=how)
    if data_2 is not None:
        out = out.join(data_2, on=right, how=how)
    return out
