"""J8 — general AS-OF join (backward): enrich each fact row with the
latest dimension row at or before its timestamp.

The classic time-series join Spark lacks natively (metadata/config
changes applied to a metric stream, tag remaps, slowly-changing
dimensions). The naive expression — a range join `d.eff_ts <= f.ts`
plus a per-fact max — is quadratic in the worst case and explodes on
a 100 TB fact table. The scalable composition used here:

    1. tag both inputs and UNION them into one stream
       (dim rows carry the payload, fact rows carry null payload);
    2. one per-key window sorted by (t, dim-first-on-ties) computes
       last(payload, ignorenulls) — the running "current" dim value;
    3. keep only fact rows.

Cost: ONE shuffle + sort, keyed and sized like any per-series window
— the same shape as gap-fill — instead of an O(|facts| x |dims|)
join. Ties: a dim row effective exactly at t sorts BEFORE facts at t,
so it applies to them (OpenTSDB/kdb asof convention: `<= ts`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str = "series_id",
    fact_ts: str = "ts",
    dim_ts: str = "eff_ts",
    payload: str = "cfg",
) -> DataFrame:
    """facts columns are preserved; ``payload`` is appended with the
    latest dim value where dim_ts <= fact_ts (null before the first
    dim row). Timestamps may be TIMESTAMP or epoch BIGINT as long as
    the two inputs agree.

    A dim row whose payload value is explicitly NULL *applies* (facts
    at or after it see NULL until the next dim row) — the row's
    presence is the event, not its value. Internally the payload is
    struct-wrapped so last(ignorenulls) skips only the union's
    fact-side filler rows, never a dim row carrying NULL.

    Raises ValueError if ``facts`` already contains the internal
    staging columns or the output ``payload`` name — silently
    overwriting caller columns is how as-of joins corrupt data."""
    reserved = {"_t", "_is_dim", "_payload", payload}
    clash = sorted(reserved & set(facts.columns))
    if clash:
        raise ValueError(
            f"asof_join: facts columns {clash} collide with the "
            f"payload/staging names; rename them before joining"
        )
    fact_cols = [c for c in facts.columns]
    d = dims.select(
        F.col(key),
        F.col(dim_ts).alias("_t"),
        F.lit(1).alias("_is_dim"),
        # non-null wrapper even when the payload value is null: the
        # dim ROW must win the ignorenulls scan
        F.struct(F.col(payload).alias("v")).alias("_payload"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in fact_cols if c != key],
    )
    f_side = facts.select(
        F.col(key),
        F.col(fact_ts).alias("_t"),
        F.lit(0).alias("_is_dim"),
        F.lit(None)
        .cast(f"struct<v:{dims.schema[payload].dataType.simpleString()}>")
        .alias("_payload"),
        *[F.col(c) for c in fact_cols if c != key],
    )
    u = d.unionByName(f_side)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_payload", ignorenulls=True).over(w)
    return (
        u.withColumn(payload, carried["v"])
        .where(F.col("_is_dim") == 0)
        .select(*fact_cols, payload)
    )
