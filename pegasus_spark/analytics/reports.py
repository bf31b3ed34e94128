"""Apartment report suite over the crawled tables — the faithful rebuild of
the reference's analytics tools (entry point C, SURVEY §3.3):

- top-K reports (tools/report.py:195-263 total1/price1/size1/tfloor): the
  per-region-table SQL + client-side k-way merge collapses into single
  DataFrame queries over the unified region-partitioned table — Catalyst's
  TakeOrderedAndProject IS reduceValset (report.py:46-74) distributed.
- price-change reports with location lookup (report.py:266-335
  priceInc/priceDec/ratio): the correlated scalar subquery
  `(SELECT location FROM data WHERE data.aid = change.aid)` becomes a
  broadcast-friendly equi-join (J5 decorrelated).
- the W1 daily price series (tools/lianjia_avg.py:165-229): listings are
  active from date(nts) to date(uts); the as-of price starts at the first
  known price (first old_price in the change stream if any —
  collect_first_price, lianjia_avg.py:87-96) and steps at each change's ts.
  The reference replays events in a driver loop; here it is interval
  expansion (sequence+explode) + a forward-fill window — shuffle on aid
  once, then a day-keyed agg.

All tie-breaks explicit (aid asc) per the §4.3 determinism discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def top_by_total(apartments: DataFrame, n: int = 10) -> DataFrame:
    """report.py total1: ORDER BY total DESC LIMIT n (global, all regions)."""
    return (
        apartments.select("region", "aid", "location", "total", "price")
        .orderBy(F.desc("total"), F.asc("aid"))
        .limit(n)
    )


def top_by_price(apartments: DataFrame, n: int = 10) -> DataFrame:
    """report.py price1: unit price desc."""
    return (
        apartments.select("region", "aid", "location", "price", "size")
        .orderBy(F.desc("price"), F.asc("aid"))
        .limit(n)
    )


def top_by_size(apartments: DataFrame, n: int = 10) -> DataFrame:
    """report.py size1/size2: CONVERT(size, DECIMAL) desc (P11 — size is a
    STRING column, cast at query time exactly like the reference)."""
    return (
        apartments.withColumn("size_num", F.col("size").cast("decimal(10,2)"))
        .select("region", "aid", "location", "size_num", "total")
        .orderBy(F.desc("size_num"), F.asc("aid"))
        .limit(n)
    )


def tfloor_histogram(apartments: DataFrame) -> DataFrame:
    """report.py tfloor: listings per total-floor count."""
    return apartments.groupBy("tfloor").count().orderBy("tfloor")


def price_changes_with_location(
    apartments: DataFrame, changes: DataFrame, direction: str = "inc", n: int = 10
) -> DataFrame:
    """report.py priceInc/priceDec (+ ratio): change rows joined back to the
    listing's location, ordered by absolute move (or ratio) desc."""
    diff = F.col("new_price") - F.col("old_price")
    ratio = F.round(diff / F.col("old_price") * 100, 2)
    filtered = changes.filter(diff > 0 if direction == "inc" else diff < 0)
    loc = apartments.select("aid", "region", "location")
    out = (
        filtered.join(loc, ["aid", "region"], "left")
        .withColumn("price_diff", diff)
        .withColumn("pct", ratio)
        .select("region", "aid", "location", "old_price", "new_price", "price_diff", "pct")
    )
    order = F.desc("price_diff") if direction == "inc" else F.asc("price_diff")
    return out.orderBy(order, F.asc("aid")).limit(n)


def first_price(apartments: DataFrame, changes: DataFrame) -> DataFrame:
    """collect_first_price (lianjia_avg.py:87-96): the earliest known price
    per aid — the first change's old_price when the listing ever changed,
    else its current price."""
    w = Window.partitionBy("aid", "region").orderBy(F.asc("ts"))
    first_old = (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter("_rk = 1")
        .select("aid", "region", F.col("old_price").alias("first_old"))
    )
    return (
        apartments.join(first_old, ["aid", "region"], "left")
        .withColumn("p0", F.coalesce("first_old", "price"))
        .select("aid", "region", "p0", "nts", "uts")
    )


def daily_price_series(apartments: DataFrame, changes: DataFrame) -> DataFrame:
    """W1: per-day (avg, exact median, count) over the set of listings active
    that day, prices stepping at their change timestamps.

    Plan: one union of day-grid rows and price-event rows per aid, a single
    forward-fill window (partition aid, order day/event-flag), then the
    day-keyed agg. Scale: expansion is bounded by listing lifetime; at
    100 TB the same plan holds because explode is narrow and the final agg
    is map-side combinable (median would switch to percentile_approx)."""
    base = first_price(apartments, changes)
    grid = base.select(
        "aid", "region",
        F.explode(
            F.sequence(F.to_date(F.from_unixtime("nts")), F.to_date(F.from_unixtime("uts")))
        ).alias("day"),
    ).withColumn("event_price", F.lit(None).cast("int")).withColumn("is_event", F.lit(0))

    p0_events = base.select(
        "aid", "region",
        F.to_date(F.from_unixtime("nts")).alias("day"),
        F.col("p0").alias("event_price"),
        F.lit(1).alias("is_event"),
    )
    change_events = changes.select(
        "aid", "region",
        F.to_date(F.from_unixtime("ts")).alias("day"),
        F.col("new_price").alias("event_price"),
        F.lit(1).alias("is_event"),
    )
    unioned = grid.unionByName(p0_events).unionByName(change_events)
    # forward fill: events sort before grid rows on the same day via
    # is_event desc, so a change applies from its own day onward
    w = (
        Window.partitionBy("aid", "region")
        .orderBy(F.asc("day"), F.desc("is_event"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "price_asof", F.last("event_price", ignorenulls=True).over(w)
    ).filter(F.col("is_event") == 0)
    return (
        filled.groupBy("day")
        .agg(
            F.round(F.avg("price_asof"), 2).alias("avg_price"),
            F.expr("percentile(price_asof, 0.5)").alias("median_price"),
            F.count(F.lit(1)).alias("active_cnt"),
        )
        .orderBy("day")
    )
