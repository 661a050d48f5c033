"""F9 — the OpenTSDB UID-table analogue: dictionary-encode names.

OpenTSDB never stores metric/tag strings on data points: every name
gets a fixed-width UID from the tsdb-uid table, and row keys carry
UIDs only (public schema docs: metric_uid + base_time + tag_uids).
The columnar analogue implemented here:

  build_uid_table   deterministic name -> uid dictionary: dense ids
                    from a row_number over the SORTED DISTINCT names.
                    The global sort touches only the dictionary
                    (bounded by |distinct series|, not |points| —
                    same single-partition-over-aggregates shape as
                    the packing prefix scan, which is |buckets|-
                    bounded), so the stream itself never sorts.
  encode_uids       broadcast-hash-join the dictionary onto the
                    points: the 100 TB side never shuffles, and the
                    rolled-up stream downstream carries an 8-byte
                    long instead of a repeated string — the same
                    storage/shuffle-width win the reference gets from
                    3-byte UIDs.
  decode_uids       the reverse broadcast join (read path).

Determinism: uid = rank of the name in sorted order, so any two runs
over the same name set agree — no monotonically_increasing_id (which
is partition-layout-dependent and non-dense by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_uid_table(df: DataFrame, name_col: str = "series_id") -> DataFrame:
    """(name string, uid long), uid dense from 0 in name order."""
    names = df.select(F.col(name_col).alias("name")).distinct()
    w = Window.orderBy("name")
    return names.select(
        "name", (F.row_number().over(w) - F.lit(1)).cast("long").alias("uid")
    )


def encode_uids(
    df: DataFrame, uid_table: DataFrame, name_col: str = "series_id"
) -> DataFrame:
    """Replace ``name_col`` with its uid (inner broadcast join — a
    name absent from the dictionary is a pipeline error upstream)."""
    return (
        df.join(
            F.broadcast(uid_table),
            df[name_col] == uid_table["name"],
            "inner",
        )
        .drop(name_col, "name")
    )


def decode_uids(
    df: DataFrame, uid_table: DataFrame, name_col: str = "series_id"
) -> DataFrame:
    """Re-attach the name for presentation/read paths."""
    return (
        df.join(F.broadcast(uid_table), "uid", "inner")
        .withColumnRenamed("name", name_col)
    )
