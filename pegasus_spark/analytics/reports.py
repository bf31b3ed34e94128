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


def _fresh(now_ts: int | None, day_offset: int = 0):
    """The reference's freshness predicate, carried by EVERY top-K:
    ``DAYOFMONTH(FROM_UNIXTIME(uts)) = DAYOFMONTH(NOW()) - day_offset``
    (report.py:197,208,218,238,247,257; price1 alone uses the -1 quirk,
    report.py:228). ``now_ts`` pins NOW() for determinism; None skips the
    filter (the pre-fidelity behavior, kept for ad-hoc use)."""
    if now_ts is None:
        return F.lit(True)
    return F.dayofmonth(F.from_unixtime("uts")) == (
        F.dayofmonth(F.from_unixtime(F.lit(now_ts))) - day_offset
    )


def top_by_total(
    apartments: DataFrame, n: int = 10, ascending: bool = False,
    now_ts: int | None = None,
) -> DataFrame:
    """report.py total1 (desc) / total2 (asc): ORDER BY total LIMIT n with
    the day-of-month freshness filter."""
    order = F.asc("total") if ascending else F.desc("total")
    return (
        apartments.filter(_fresh(now_ts))
        .select("region", "aid", "location", "total", "price")
        .orderBy(order, F.asc("aid"))
        .limit(n)
    )


def top_by_price(
    apartments: DataFrame, n: int = 10, ascending: bool = False,
    now_ts: int | None = None,
) -> DataFrame:
    """report.py price1 (desc, with the DAYOFMONTH(NOW())-1 quirk —
    report.py:228) / price2 (asc, same-day)."""
    order = F.asc("price") if ascending else F.desc("price")
    return (
        apartments.filter(_fresh(now_ts, day_offset=0 if ascending else 1))
        .select("region", "aid", "location", "price", "total")
        .orderBy(order, F.asc("aid"))
        .limit(n)
    )


def top_by_size(
    apartments: DataFrame, n: int = 10, ascending: bool = False,
    now_ts: int | None = None,
) -> DataFrame:
    """report.py size1/size2: CONVERT(size, DECIMAL) — size is a STRING
    column cast at query time; MySQL's bare DECIMAL is (10,0), i.e. rounds
    to an integer m², reproduced here."""
    order = F.asc("size_num") if ascending else F.desc("size_num")
    return (
        apartments.filter(_fresh(now_ts))
        .withColumn("size_num", F.col("size").cast("decimal(10,0)"))
        .select("region", "aid", "location", "size_num", "price", "total")
        .orderBy(order, F.asc("aid"))
        .limit(n)
    )


def top_by_total_with_tfloor(
    apartments: DataFrame, n: int = 10, now_ts: int | None = None
) -> DataFrame:
    """report.py tfloor (report.py:216-224): NOT a histogram — the bottom-10
    by total, displaying the tfloor column."""
    return (
        apartments.filter(_fresh(now_ts))
        .select("region", "aid", "location", "price", "total", "tfloor")
        .orderBy(F.asc("total"), F.asc("aid"))
        .limit(n)
    )


def tfloor_histogram(apartments: DataFrame) -> DataFrame:
    """Rebuild extra (not in the reference): listings per total-floor count."""
    return apartments.groupBy("tfloor").count().orderBy("tfloor")


def total_changes_report(
    apartments: DataFrame, changes: DataFrame, direction: str = "inc", n: int = 10,
    by_ratio: bool = False, now_ts: int | None = None, window_days: int = 3,
) -> DataFrame:
    """report.py priceInc/priceDec/priceIncRatio/priceDecRatio
    (report.py:266-335), faithfully:

    - diffs **total** (old_total/new_total), not unit price;
    - only changes inside ``DATEDIFF(NOW(), FROM_UNIXTIME(ts)) <= 3``;
    - a ``DATE_FORMAT(FROM_UNIXTIME(ts),'%Y-%m-%d')`` date column;
    - ratio variants ORDER BY (new-old)/old (displayed ×100);
    - the correlated location subquery (on aid alone) decorrelated to a
      broadcast equi-join (J5).
    Tie-break aid asc added per §4.3 (MySQL's LIMIT order is undefined on
    ties; ours must not be)."""
    diff = F.col("new_total") - F.col("old_total")
    ratio = diff / F.col("old_total")
    filtered = changes
    if now_ts is not None:
        filtered = filtered.filter(
            F.datediff(
                F.to_date(F.from_unixtime(F.lit(now_ts))),
                F.to_date(F.from_unixtime("ts")),
            )
            <= window_days
        )
    loc = apartments.select("aid", "location").distinct()
    key = F.round(ratio, 6) if by_ratio else diff
    out = (
        filtered.join(F.broadcast(loc), "aid", "left")
        .withColumn("change", diff)
        .withColumn("ratio_pct", F.round(ratio * 100, 2))
        .withColumn("date", F.date_format(F.from_unixtime("ts"), "yyyy-MM-dd"))
        .withColumn("_key", key)
    )
    order = F.desc("_key") if direction == "inc" else F.asc("_key")
    cols = ["aid", "location", "old_total", "new_total",
            "ratio_pct" if by_ratio else "change", "date"]
    return out.orderBy(order, F.asc("aid")).limit(n).select(*cols)


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
    grid = (
        base.select(
            "aid", "region",
            F.explode(
                F.sequence(F.to_date(F.from_unixtime("nts")), F.to_date(F.from_unixtime("uts")))
            ).alias("day"),
        )
        .withColumn("event_price", F.lit(None).cast("int"))
        .withColumn("is_event", F.lit(0))
        .withColumn("ev_ts", F.lit(0).cast("bigint"))
    )

    p0_events = base.select(
        "aid", "region",
        F.to_date(F.from_unixtime("nts")).alias("day"),
        F.col("p0").alias("event_price"),
        F.lit(1).alias("is_event"),
        F.col("nts").alias("ev_ts"),
    )
    change_events = changes.select(
        "aid", "region",
        F.to_date(F.from_unixtime("ts")).alias("day"),
        F.col("new_price").alias("event_price"),
        F.lit(1).alias("is_event"),
        F.col("ts").alias("ev_ts"),
    )
    unioned = grid.unionByName(p0_events).unionByName(change_events)
    # forward fill: events sort before grid rows on the same day via
    # is_event desc; two same-day events for one aid tie-break on the raw
    # change ts then price, so the as-of price is a total order (§4.3 —
    # without ev_ts the winner depended on partitioning)
    w = (
        Window.partitionBy("aid", "region")
        .orderBy(F.asc("day"), F.desc("is_event"), F.asc("ev_ts"), F.asc("event_price"))
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


def dup_rate_report(
    df: DataFrame, group_col: str, exact_col: str, fp_col: str,
) -> DataFrame:
    """Per-group duplication triage — "which source is polluting the
    corpus?": for each group, the row count, how many rows share their EXACT
    key with any other row corpus-wide, how many share their FINGERPRINT
    (the cheap candidate-duplicate signal), and the fingerprint-dup rate.
    Shared core of the gated ``dup_rate_by_source`` (documents: md5(text) /
    winnow fingerprint) and the crawl-store caption report (items:
    md5(caption) / phash). Scale shape: two key-only partial-agg shuffles
    for the corpus-wide group sizes, hash-joins back, then a tiny per-group
    agg — payloads never move past the caller's key projection."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(exact_col).alias("h"),
        F.col(fp_col).alias("fp"),
    )
    hs = base.groupBy("h").agg(F.count(F.lit(1)).alias("hgrp"))
    fs = base.groupBy("fp").agg(F.count(F.lit(1)).alias("fgrp"))
    return (
        base.join(hs, "h")
        .join(fs, "fp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("hgrp") >= 2, 1).otherwise(0)).alias("n_exact_dups"),
            F.sum(F.when(F.col("fgrp") >= 2, 1).otherwise(0)).alias("n_fp_dups"),
            F.round(
                F.avg(F.when(F.col("fgrp") >= 2, 1.0).otherwise(0.0)), 4
            ).alias("fp_dup_rate"),
        )
        .withColumnRenamed("grp", group_col)
        .orderBy(group_col)
    )


def caption_dup_report(items: DataFrame) -> DataFrame:
    """The crawl-side dup-rate triage over a committed items table
    (image_id, …, caption, phash): per REGION (parsed from the
    ``img-{abbr}-{page}-{pos}`` id scheme, fixtures.image_id_for), exact
    caption duplication and phash-level near-duplication — the report a
    crawl operator reads to find which region's listings are recycled
    boilerplate. Bytes never enter the plan (key projection first)."""
    keyed = items.select(
        F.element_at(F.split("image_id", "-"), 2).alias("region"),
        F.md5("caption").alias("caption_md5"),
        F.col("phash").cast("string").alias("phash_key"),
    )
    return dup_rate_report(keyed, "region", "caption_md5", "phash_key")


def caption_dup_histogram(items: DataFrame) -> DataFrame:
    """Dedup yield curve over a committed items table — the crawl-side
    consumer of ``textops.dedup.group_size_histogram``: exact caption-dup
    group sizes and how much of the caption corpus each size class holds,
    the "is the duplication a pair-tail or a few boilerplate mega-groups?"
    read a crawl operator takes before scheduling a dedup pass.  The key
    projection (md5 of the caption) happens before anything moves — caption
    text and image bytes never enter an exchange."""
    from pegasus_spark.textops.dedup import group_size_histogram

    keyed = items.select(F.md5("caption").alias("caption_md5"))
    return group_size_histogram(keyed, key_col="caption_md5")


def image_cluster_density(items: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Transitive-merge risk audit over a committed items table's phash
    near-dup clusters — the crawl-side consumer of
    ``textops.dedup.cluster_pair_density``: per cluster size, how many of
    the possible member pairs are DIRECT Hamming pairs. A large cluster
    at low per-mille density was merged by CHAINING (drift series A~B~C
    where the endpoints exceed the radius) — the cluster an operator
    re-verifies before letting the image keeper pass collapse it to one
    copy. Scale shape: the pair graph comes from the bucketed chunk join
    (hamming_near_dups — 8-byte chunk values shuffle, never bytes), the
    pair plan is checkpointed once for CC + density, and the output is
    bounded by distinct cluster sizes."""
    from pegasus_spark.textops.dedup import (
        cluster_pair_density,
        hamming_near_dups,
        near_dup_clusters,
    )

    keyed = items.select("image_id", "phash")
    pairs = hamming_near_dups(
        keyed, "phash", max_hamming=max_hamming, chunks=4,
        id_col="image_id", n_bits=64,
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    clusters = near_dup_clusters(keyed, pairs, id_col="image_id")
    return cluster_pair_density(clusters, pairs, id_col="image_id")


def caption_span_report(items: DataFrame, n: int = 3) -> DataFrame:
    """Per-region boilerplate-SPAN triage over a committed items table — the
    crawl-side consumer of ``dup_span_stats`` (Lee et al. 2022 exact-substring
    signal): how much of each region's caption corpus is built from n-token
    spans repeated anywhere in the corpus. Captions are short, so the span
    length defaults to 3 tokens (the documents-table operator defaults to 8;
    the crawl fixture's listing captions are exactly 3 tokens).
    A flagged caption (≥1 corpus-repeated span) is the one span_scrub or a
    blocklist would rewrite. Output: (region, n_captions, n_flagged,
    flagged_rate, avg_dup_ratio). Scale shape inherits dup_span_stats' single
    md5-key shuffle; the rollup adds one region-keyed partial agg over
    per-caption count triples — caption text never moves past the explode."""
    from pegasus_spark.textops.dedup import dup_span_stats

    stats = dup_span_stats(
        items.select("image_id", "caption"), n=n,
        text_col="caption", id_col="image_id",
    )
    keyed = stats.withColumn(
        "region", F.element_at(F.split("image_id", "-"), 2)
    )
    return (
        keyed.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_captions"),
            F.sum(F.when(F.col("n_dup_spans") > 0, 1).otherwise(0))
            .cast("bigint").alias("n_flagged"),
            F.round(
                F.avg(F.when(F.col("n_dup_spans") > 0, 1.0).otherwise(0.0)), 4
            ).alias("flagged_rate"),
            F.round(F.avg("dup_span_ratio"), 4).alias("avg_dup_ratio"),
        )
        .orderBy("region")
    )


def caption_pii_report(items: DataFrame) -> DataFrame:
    """Per-region PII triage over a committed items table — the crawl-side
    consumer of ``textops.text.pii_scrub``: how many of each region's
    captions carry an email / IPv4 / phone number, i.e. what a pre-release
    scrub pass would redact from this crawl's caption corpus. Output:
    (region, n_captions, n_with_pii, pii_rate, n_email, n_ipv4, n_phone).
    Scale shape: pii_scrub is a pure narrow map (the regexes fuse into the
    scan); the rollup is one region-keyed partial agg over per-caption count
    triples — caption text never enters an exchange."""
    from pegasus_spark.textops.text import pii_scrub

    counts = pii_scrub(
        items.select("image_id", "caption"),
        text_col="caption", id_col="image_id",
    )
    keyed = counts.withColumn(
        "region", F.element_at(F.split("image_id", "-"), 2)
    )
    has_pii = (
        (F.col("n_email") > 0) | (F.col("n_ipv4") > 0) | (F.col("n_phone") > 0)
    )
    return (
        keyed.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_captions"),
            F.sum(F.when(has_pii, 1).otherwise(0)).cast("bigint")
            .alias("n_with_pii"),
            F.round(F.avg(F.when(has_pii, 1.0).otherwise(0.0)), 4)
            .alias("pii_rate"),
            F.sum("n_email").cast("bigint").alias("n_email"),
            F.sum("n_ipv4").cast("bigint").alias("n_ipv4"),
            F.sum("n_phone").cast("bigint").alias("n_phone"),
        )
        .orderBy("region")
    )


def caption_datacard(items: DataFrame) -> DataFrame:
    """Per-region release datasheet over a committed items table — the
    crawl-side twin of the gated ``corpus_datacard``: volume (images,
    caption tokens, share of the crawl), exact caption-dup and phash-dup
    rates, mean caption length, mean decoded megapixels, and the dominant
    image format. The one-page read a crawl operator takes before exporting
    shards: which regions carry the mass, where the boilerplate is, what
    the pixel payload looks like.

    Scale shape mirrors the gated twin: captions reduce to md5 (and images
    to their stored 8-byte phash / dims) BEFORE anything moves; two
    partial-aggregable groupBys on bounded keys, a 1-row broadcast total,
    and a WindowGroupLimit format argmax over |regions|×|fmts| aggregated
    rows — image bytes never enter the plan (column pruning drops them at
    the scan)."""
    base = items.select(
        F.element_at(F.split("image_id", "-"), 2).alias("region"),
        "fmt",
        F.size(F.split(F.trim(F.col("caption")), r"\s+")).alias("n_tokens"),
        F.length("caption").alias("n_chars"),
        F.md5("caption").alias("cap_md5"),
        "phash",
        (F.col("w").cast("bigint") * F.col("h")).alias("pixels"),
    )
    per_region = base.groupBy("region").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("n_tokens").cast("bigint").alias("total_caption_tokens"),
        F.countDistinct("cap_md5").alias("n_uniq_captions"),
        F.countDistinct("phash").alias("n_uniq_phash"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("pixels").cast("bigint").alias("total_pixels"),
    )
    total = per_region.agg(F.sum("n_images").alias("corpus_images"))
    fc = base.groupBy("region", "fmt").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("region").orderBy(F.desc("n"), F.asc("fmt"))
    top_fmt = (
        fc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("region", F.col("fmt").alias("top_fmt"))
    )
    return (
        per_region.join(F.broadcast(top_fmt), "region")
        .crossJoin(F.broadcast(total))
        .select(
            "region",
            "n_images",
            "total_caption_tokens",
            F.round(F.col("n_images") / F.col("corpus_images"), 4)
            .alias("pct_corpus"),
            F.round(
                F.lit(1.0) - F.col("n_uniq_captions") / F.col("n_images"), 4
            ).alias("caption_dup_rate"),
            F.round(
                F.lit(1.0) - F.col("n_uniq_phash") / F.col("n_images"), 4
            ).alias("phash_dup_rate"),
            F.round(F.col("total_chars") / F.col("n_images"), 2)
            .alias("mean_caption_chars"),
            F.round(F.col("total_pixels") / F.col("n_images") / 1e6, 3)
            .alias("mean_megapixels"),
            "top_fmt",
        )
        .orderBy("region")
    )


def boilerplate_spans(items: DataFrame, n: int = 3, top: int = 20) -> DataFrame:
    """The literal boilerplate: the n-token caption spans repeated most often
    corpus-wide, with occurrence + distinct-caption counts — the strings a
    crawl operator turns into a scrub/blocklist. The gated span operators
    move only md5 keys; a top-N report is FOR humans, so here the top spans
    themselves surface — one partial-agg shuffle on the span string (map-side
    combined, so a hot boilerplate span arrives pre-counted) and a global
    top-N (TakeOrderedAndProject), deterministic via the full
    (count desc, captions desc, span asc) tie-break."""
    from pegasus_spark.textops.text import word_grams

    g = items.select(
        "image_id",
        F.explode(word_grams("caption", n=n, clamp=False)).alias("span"),
    )
    return (
        g.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("image_id").cast("bigint").alias("n_captions"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), F.desc("n_captions"), F.asc("span"))
        .limit(top)
    )

def recrawl_schedule(
    apartments: DataFrame,
    changes: DataFrame | None,
    now_ts: int,
    horizon_s: int = 7 * 86400,
) -> DataFrame:
    """Change-frequency re-crawl schedule over a committed crawl store — the
    crawl-side twin of the gated ``recrawl_priority`` (Cho & Garcia-Molina
    mean-interval estimator): each listing's observations are its first-seen
    time (nts) plus every recorded price/total change, so a listing with N
    change rows gets interval = (last_change - nts) div N and is due that
    long after its last change; never-changed listings get the default
    ``horizon_s``. The reference re-fetches every page each run
    (cli/crawler.go's unconditional rounds loop) — this is what replaces
    that at a frontier too big to sweep.

    Emits NO global rank: the frontier's LPT dequeue owns prioritization,
    and a corpus-wide overdue ordering would be a single-partition window.
    Output: (aid, region, n_changes, last_obs_ts, interval_s, next_due_ts,
    overdue_s, due_now).

    Scale shape: one partial-aggregable groupBy on the change log + one
    equi-join back to the listings on (aid, region) — the change table is
    CDC-sized (a fraction of the corpus), so AQE broadcasts it when small
    and the join degenerates to the listings' existing partitioning."""
    if changes is None:
        ch = None
    else:
        ch = changes.groupBy("aid", "region").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_changes"),
            F.max("ts").cast("bigint").alias("last_change_ts"),
        )
    base = apartments.select("aid", "region", F.col("nts").cast("bigint").alias("nts"))
    if ch is not None:
        base = base.join(ch, ["aid", "region"], "left")
    else:
        base = base.withColumn("n_changes", F.lit(None).cast("bigint")).withColumn(
            "last_change_ts", F.lit(None).cast("bigint")
        )
    est = base.select(
        "aid",
        "region",
        F.coalesce("n_changes", F.lit(0)).cast("bigint").alias("n_changes"),
        F.coalesce("last_change_ts", F.col("nts")).cast("bigint").alias("last_obs_ts"),
        F.when(
            F.col("n_changes").isNotNull(),
            F.expr("(last_change_ts - nts) div n_changes"),
        )
        .otherwise(F.lit(horizon_s))
        .cast("bigint")
        .alias("interval_s"),
    )
    return (
        est.withColumn(
            "next_due_ts", (F.col("last_obs_ts") + F.col("interval_s")).cast("bigint")
        )
        .withColumn("overdue_s", (F.lit(now_ts) - F.col("next_due_ts")).cast("bigint"))
        .withColumn("due_now", F.col("overdue_s") >= 0)
    )

def politeness_audit(fetch_log: DataFrame, budget: DataFrame) -> DataFrame:
    """Crawler-integrity audit over the committed fetch_log: did every host
    actually get the politeness it was promised? Two contracts are checked
    against the budget table — same-host fetches within a round must be
    ≥ min_interval_ms apart (the in-batch spacing the fetcher enforces,
    fetch.py's politeness contract), and no round may fetch more than
    max_per_round pages from one host (the dequeue's per-host top-K bound).
    A healthy store reports ok = true for every host; anything else means a
    fetch-path regression (e.g. a respread that broke host co-location).

    Output: (host, min_interval_ms, max_per_round, n_fetches, n_rounds,
    min_gap_ms, n_gap_violations, max_round_fetches, n_budget_violations,
    ok), one row per host.

    Robots-refused rows (status 451) are excluded up front: the fetcher
    stamps them without requesting anything (fetch.py STATUS_ROBOTS —
    "never actually requested"), so their timestamps carry no politeness
    obligation and would fabricate gap violations on the real-HTTP path.
    Hosts absent from the budget table audit against the SAME defaults the
    dequeue enforces (coalesce: max_per_round 32, min_interval_ms 0,
    frontier.dequeue) — a left-join null must not vacuously pass.

    Scale shape: the gap window partitions by (host, round) — bounded by
    max_per_round rows per partition, never a hot key; the budget join
    BROADCASTS (hosts × 4 columns); then two partial-aggregable groupBys
    (per-(host, round), then per-host). The log's url/body columns prune
    out at the scan."""
    rows = (
        fetch_log.filter(F.col("status") != 451)
        .select("host", "round", "seq", "fetch_ts_ms")
        .join(
            F.broadcast(budget.select("host", "min_interval_ms", "max_per_round")),
            "host",
            "left",
        )
        .withColumn("max_per_round", F.coalesce("max_per_round", F.lit(32)))
        .withColumn("min_interval_ms", F.coalesce("min_interval_ms", F.lit(0)))
    )
    w = Window.partitionBy("host", "round").orderBy("fetch_ts_ms", "seq")
    gapped = rows.withColumn(
        "gap_ms", F.col("fetch_ts_ms") - F.lag("fetch_ts_ms").over(w)
    )
    per_round = gapped.groupBy("host", "round", "min_interval_ms", "max_per_round").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.min("gap_ms").cast("bigint").alias("_min_gap"),
        F.sum(
            F.when(F.col("gap_ms") < F.col("min_interval_ms"), 1).otherwise(0)
        ).cast("bigint").alias("_gap_viol"),
    )
    return (
        per_round.groupBy("host", "min_interval_ms", "max_per_round")
        .agg(
            F.sum("_n").cast("bigint").alias("n_fetches"),
            F.count(F.lit(1)).cast("bigint").alias("n_rounds"),
            F.min("_min_gap").cast("bigint").alias("min_gap_ms"),
            F.sum("_gap_viol").cast("bigint").alias("n_gap_violations"),
            F.max("_n").cast("bigint").alias("max_round_fetches"),
            F.sum(F.when(F.col("_n") > F.col("max_per_round"), 1).otherwise(0))
            .cast("bigint").alias("n_budget_violations"),
        )
        .withColumn(
            "ok",
            (F.col("n_gap_violations") == 0) & (F.col("n_budget_violations") == 0),
        )
        .orderBy("host")
    )


def caption_rule_ablation(items: DataFrame) -> DataFrame:
    """Filter-ablation table over a committed items table's captions — the
    crawl-side twin of the gated ``rule_ablation``, run against the C4 rule
    family (captions are short single sentences, so the C4 predicates are
    the meaningful ones — Gopher's 32-token floor would reject every
    caption vacuously): per rule, how many captions fail it, how many fail
    ONLY it (recoverable by relaxing that one threshold), and the any-rule
    row. The read a crawl operator takes before exporting a caption corpus:
    "which filter would cost us the most captions, and which casualties are
    one-rule-recoverable".

    Scale shape: with_c4_rules is a pure narrow map over the caption column
    and flag_ablation reduces through ONE 1-row partial-aggregable
    aggregate — caption text never enters an exchange."""
    from pegasus_spark.textops.text import flag_ablation, with_c4_rules

    flagged = with_c4_rules(
        items.select(F.col("caption").alias("text"))
    )
    return flag_ablation(
        flagged,
        ["c_terminal", "c_min_words", "c_no_braces", "c_no_lorem", "c_no_badword"],
    )


def caption_quality_sweep(items: DataFrame) -> DataFrame:
    """Quality-filter operating-point table over a committed items table's
    captions — the crawl-side twin of the gated ``threshold_sweep``: for
    each decile quality cut, how many captions (and caption tokens) survive
    and their share of the pool. The read a crawl operator takes to PICK
    the caption-quality floor before exporting a training corpus, the same
    way caption_rule_ablation picks between C4 rules.

    Scale shape inherited from quality_threshold_sweep: one ≤10-bucket
    combinable aggregate; the cumulative/share windows see only histogram
    rows. Empty captions are excluded up front (their quality score is
    undefined — 0/0 ratios)."""
    from pegasus_spark.textops.text import quality_threshold_sweep

    caps = items.select(F.col("caption").alias("text")).filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    return quality_threshold_sweep(caps)


def caption_vocab(items: DataFrame) -> DataFrame:
    """Per-region caption vocabulary datacard over a committed items table —
    the crawl twin of the gated ``vocab_stats``: token occurrences,
    distinct vocabulary, hapax legomena, type-token ratio, hapax share,
    and the dominant word. A region whose captions come from a template
    shows a cratered hapax share and a suspicious dominant word long
    before any dup-rate pass runs — this is the cheap first look.

    Shares :func:`pegasus_spark.textops.text.vocab_stats` (the
    flag_ablation shared-core precedent). Captions reduce to
    (region, word) rows before anything moves; the items table's image
    bytes prune at the scan."""
    from pegasus_spark.textops.text import vocab_stats

    caps = items.select(
        F.element_at(F.split("image_id", "-"), 2).alias("region"),
        F.col("caption").alias("text"),
    )
    return vocab_stats(caps, group_col="region")


def price_history(apartments: DataFrame, changes: DataFrame | None) -> DataFrame:
    """SCD2 price-validity intervals per apartment — the lakehouse
    "dimension history" view built from the CDC change log: each aid gets
    one row per price regime (price, valid_from, valid_to, is_current),
    where the opening interval starts at nts (first-seen, preserved
    across updates by the J1 contract) with the EARLIEST known price (the
    first change row's old_price — the value the apartment carried before
    any recorded change; current price if no change ever fired) and each
    change at ts closes the previous interval and opens the next at
    new_price. The interval form answers "what was the price on day X"
    with one BETWEEN predicate — the point-in-time query the raw change
    log needs a window for every time.

    Scale shape: one aid-keyed window over the change log (first change),
    one union of apartment-sized and change-sized interval openers, one
    aid-keyed lead window — all exchanges key on aid, AQE reuses the
    partitioning. Timestamps are epoch-second BIGINTs end-to-end."""
    base = apartments.select("aid", "region", "price", "nts")
    if changes is None:
        ivals = base.select(
            "aid", "region", "price", F.col("nts").cast("bigint").alias("valid_from")
        )
    else:
        # the upsert key is (aid, region) — cdc.merge_apartments joins on
        # both, so the history partitions on both too
        w1 = Window.partitionBy("aid", "region").orderBy(
            F.asc("ts"), F.asc("new_price")
        )
        first_chg = (
            changes.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .select("aid", "region", F.col("old_price").alias("_first_price"))
        )
        opening = base.join(first_chg, ["aid", "region"], "left").select(
            "aid",
            "region",
            F.coalesce("_first_price", "price").alias("price"),
            F.col("nts").cast("bigint").alias("valid_from"),
        )
        steps = changes.select(
            "aid", "region",
            F.col("new_price").alias("price"),
            F.col("ts").cast("bigint").alias("valid_from"),
        )
        ivals = opening.unionByName(steps)
    w = Window.partitionBy("aid", "region").orderBy(
        F.asc("valid_from"), F.asc("price")
    )
    return (
        ivals.withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("aid", "region", "valid_from")
    )


def caption_collocations(items: DataFrame, topk: int = 20) -> DataFrame:
    """Top caption collocations by PMI over a committed items table — the
    crawl twin of the gated ``pmi_bigrams``: template captions show up as
    a head of maxed-out lift pairs (every occurrence of w1 is followed by
    w2) long before a dup pass runs, the same smoke-alarm role
    caption_vocab plays for single words. Shares
    :func:`pegasus_spark.textops.text.pmi_bigrams` (the flag_ablation
    shared-core precedent); captions reduce to word counts before
    anything moves and the items table's image bytes prune at the scan."""
    from pegasus_spark.textops.text import pmi_bigrams

    caps = items.select(F.col("caption").alias("text"))
    return pmi_bigrams(caps, min_count=3, topk=topk)


def volume_anomaly_flags(
    df: DataFrame, key_col: str, period_col: str,
    count_alias: str = "n_events", mean_alias: str = "mean_events",
) -> DataFrame:
    """Shared volume-anomaly core (the flag_ablation precedent — one
    implementation serves the gated ``daily_anomaly`` and the crawl-side
    ``fetch_volume_anomaly``): per (key, period) volumes flagged where
    they deviate from the key's per-period mean by more than 2σ.

    The grid is DENSIFIED first: every observed key × every observed
    period gets a row, zero-filled — a complete outage (a key producing
    NOTHING in a period) must flag, and a missing row can neither hide it
    nor bias n/mean/σ for the periods that did report.

    Exact-integer discipline: the 2σ test rearranges to
    (c·n − S)² > 4(nQ − S²) over BIGINT counts, so the verdict is
    partition-order invariant and engine-exact (at petabyte-day counts
    the squares would move to DECIMAL(38)). Scale shape: one combinable
    (key, period) groupBy; the key × period grid is bounded (both sides
    are distinct sets of the aggregated output); the |keys|-row stats
    rollup broadcasts back."""
    d = df.groupBy(key_col, period_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    dense = (
        d.select(key_col).distinct()
        .crossJoin(d.select(period_col).distinct())
        .join(d, [key_col, period_col], "left")
        .select(
            key_col, period_col,
            F.coalesce("_c", F.lit(0)).cast("bigint").alias(count_alias),
        )
    )
    s = dense.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(count_alias).alias("sc"),
        F.sum(F.col(count_alias) * F.col(count_alias)).alias("q"),
    )
    c = F.col(count_alias)
    return (
        dense.join(F.broadcast(s), key_col)
        .select(
            key_col,
            period_col,
            count_alias,
            F.round(F.col("sc") / F.col("n"), 4).alias(mean_alias),
            (
                (c * F.col("n") - F.col("sc")) * (c * F.col("n") - F.col("sc"))
                > 4 * (F.col("n") * F.col("q") - F.col("sc") * F.col("sc"))
            ).alias("is_anomaly"),
        )
        .orderBy(key_col, period_col)
    )


def fetch_volume_anomaly(fetch_log: DataFrame) -> DataFrame:
    """Fetch-volume anomaly flags over the committed fetch_log — the crawl
    twin of the gated ``daily_anomaly``, keyed on (status, round): rounds
    where one status class's volume deviates from that class's per-round
    mean by more than 2σ. This is the crawl-health alert surface — a 5xx
    spike (a source melting down), a 451 spike (a robots change), or a
    200-volume crater (a stalled frontier) all show up as flagged rows;
    the (status × round) grid is zero-filled so a class that vanishes in
    a round still gets a row to flag. Shares :func:`volume_anomaly_flags`
    with daily_anomaly — the log's url/body columns prune at the scan."""
    return volume_anomaly_flags(
        fetch_log.select("status", "round"), "status", "round",
        count_alias="n_fetches", mean_alias="mean_fetches",
    )
