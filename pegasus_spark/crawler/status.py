"""Crawl status surface — the rebuild of the reference's CLI status command
(entry point B, /root/reference/src/pegasus/cli/status.go:473-498 and
masterproj.go:223-238): given a crawl workdir, report overall progress, the
per-round series, and the frontier's current state breakdown, without
touching scheduler internals — everything comes from the committed store
(checkpoint manifest + rounds table + frontier snapshot), so it is safe to
run WHILE a crawl is in flight: it sees exactly the last committed round.

Usage::

    python -m pegasus_spark.crawler.status <workdir>        # JSON to stdout
    crawl_status(spark, workdir)                            # dict
"""

from __future__ import annotations

import json
import sys
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pegasus_spark.crawler.frontier import FrontierStore


def crawl_status(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None
) -> dict[str, Any]:
    """Point-in-time status from the committed store state (manifest-atomic:
    a half-written round is invisible). Keys mirror status.go's sections:
    run header, per-round rows, frontier state totals."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        return {"state": "not_started", "rounds": 0}
    out: dict[str, Any] = {
        "state": "finished" if ckpt.finished else "running",
        "rounds": ckpt.round,
        "counters": dict(ckpt.counters),
    }
    rounds_df = store.read_appended("rounds", ckpt.appended_rounds)
    if rounds_df is not None:
        out["round_series"] = [
            {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.asDict().items()}
            for r in sorted(rounds_df.collect(), key=lambda r: r["round"])
        ]
    # state totals from the lineage table (host, state, url_cnt) — an
    # O(hosts)-row scan instead of the O(urls) frontier scan; the legacy
    # fallback reads the frontier for stores written before the table existed
    if ckpt.lineage_version >= 0:
        import pyspark.sql.functions as F

        lin = store.read_lineage(ckpt.lineage_version)
        out["frontier_states"] = {
            r["state"]: int(r["cnt"])
            for r in lin.groupBy("state").agg(F.sum("url_cnt").alias("cnt")).collect()
        }
        out["n_hosts"] = lin.select("host").distinct().count()
    else:
        frontier = store.read_frontier(ckpt.frontier_version)
        out["frontier_states"] = {
            r["state"]: r["count"]
            for r in frontier.groupBy("state").count().collect()
        }
    return out


def crawl_dup_report(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None
) -> Any:
    """Per-region caption/phash duplication over the COMMITTED items table —
    the "which source is polluting the corpus" triage
    (analytics/reports.caption_dup_report) surfaced on the crawl CLI. Reads
    only manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_dup_report

    return caption_dup_report(items)


def crawl_dup_histogram(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None
) -> Any:
    """Caption dedup YIELD CURVE over the COMMITTED items table
    (analytics/reports.caption_dup_histogram): exact-dup group-size
    distribution + cumulative corpus share — the companion to
    crawl_dup_report's per-region rates that says whether the duplication
    is a pair-tail or a few boilerplate mega-groups. Reads only
    manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_dup_histogram

    return caption_dup_histogram(items)


def crawl_span_report(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
    n: int = 3, top: int = 20,
) -> dict[str, Any]:
    """Boilerplate-span triage over the COMMITTED items table — "which
    captions are boilerplate spans": per-region flagged rates
    (reports.caption_span_report, the dup_span_stats consumer) plus the top
    repeated span strings themselves (reports.boilerplate_spans — what a
    span_scrub blocklist would be seeded with). Reads only
    manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import boilerplate_spans, caption_span_report

    return {
        "regions": [r.asDict() for r in caption_span_report(items, n=n).collect()],
        "top_spans": [
            r.asDict() for r in boilerplate_spans(items, n=n, top=top).collect()
        ],
    }


def crawl_pii_report(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """PII triage over the COMMITTED items table — "what would a pre-release
    scrub redact from this crawl's captions": per-region counts of captions
    carrying an email / IPv4 / phone number
    (reports.caption_pii_report, the pii_scrub consumer). Reads only
    manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_pii_report

    return [r.asDict() for r in caption_pii_report(items).collect()]


def crawl_caption_vocab(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Per-region caption vocabulary datacard over the COMMITTED items
    table (reports.caption_vocab, the crawl twin of the gated
    vocab_stats): token occurrences, vocabulary, hapax legomena, TTR,
    hapax share, dominant word — the template-caption smoke alarm. Reads
    only manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_vocab

    return [r.asDict() for r in caption_vocab(items).collect()]


def crawl_price_history(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> dict[str, Any]:
    """SCD2 price-validity intervals from the COMMITTED store
    (reports.price_history over the checkpointed apartments version +
    manifest-referenced change rounds): summary counts plus the full
    interval history for every aid that has at least one recorded price
    change (bounded by the change log, not the apartment count; capped at
    200 rows with an (aid, valid_from) tie-broken order). Safe while a
    crawl runs — reads only the committed version/rounds."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None or ckpt.apartments_version < 0:
        raise FileNotFoundError(f"no committed apartments under {workdir}")
    apartments = store.read_apartments(ckpt.apartments_version)
    changes = store.read_appended("changes", ckpt.appended_rounds)
    from pegasus_spark.analytics.reports import price_history

    hist = price_history(apartments, changes)
    per_key = hist.groupBy("aid", "region").agg(F.count(F.lit(1)).alias("_n"))
    changed = per_key.filter(F.col("_n") >= 2).select("aid", "region")
    rows = (
        hist.join(F.broadcast(changed), ["aid", "region"], "left_semi")
        .orderBy("aid", "region", "valid_from")
        .limit(200)
        .collect()
    )
    return {
        "n_tracked": apartments.count(),
        "n_changed": changed.count(),
        "histories": [r.asDict() for r in rows],
    }


def crawl_caption_collocations(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Top caption collocations by PMI over the COMMITTED items table
    (reports.caption_collocations, the crawl twin of the gated
    pmi_bigrams): maxed-out lift pairs flag template captions before any
    dup pass. Reads only manifest-referenced rounds, so it is safe while
    a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_collocations

    return [r.asDict() for r in caption_collocations(items).collect()]


def crawl_datacard(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Per-region release datasheet over the COMMITTED items table
    (reports.caption_datacard, the crawl twin of the gated corpus_datacard):
    volume, caption-token totals, exact caption/phash dup rates, mean
    caption length, mean megapixels, dominant format. Reads only
    manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_datacard

    return [r.asDict() for r in caption_datacard(items).collect()]


def crawl_image_cluster_density(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Phash-cluster density audit over the COMMITTED items table
    (reports.image_cluster_density, the crawl twin of the gated
    cluster_density): per cluster size, how many possible member pairs are
    direct Hamming pairs — a big low-density cluster was merged by a drift
    chain and deserves a look before the keeper pass collapses it. Reads
    only manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import image_cluster_density

    return [r.asDict() for r in image_cluster_density(items).collect()]



def crawl_rule_ablation(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Filter-ablation table over the COMMITTED items table's captions —
    "which C4 rule would cost this crawl the most captions"
    (reports.caption_rule_ablation, the crawl twin of the gated
    rule_ablation; C4 rules because caption-length makes Gopher's floors
    vacuous). Reads only manifest-referenced rounds, so it is safe while a
    crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_rule_ablation

    return [r.asDict() for r in caption_rule_ablation(items).collect()]


def crawl_quality_sweep(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Caption quality operating-point table over the COMMITTED items table
    (reports.caption_quality_sweep, the crawl twin of the gated
    threshold_sweep): captions/tokens surviving each decile quality cut —
    the read that picks the caption-quality floor before an export. Reads
    only manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        raise FileNotFoundError(f"no committed items rounds under {workdir}")
    from pegasus_spark.analytics.reports import caption_quality_sweep

    return [r.asDict() for r in caption_quality_sweep(items).collect()]


def crawl_volume_anomaly(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
) -> list[dict[str, Any]]:
    """Fetch-volume anomaly table over the COMMITTED fetch_log
    (reports.fetch_volume_anomaly, the crawl twin of the gated
    daily_anomaly): per (status, round) volumes flagged where they deviate
    from that status class's per-round mean by more than 2σ — exact
    integer arithmetic, so the flags are rerun-invariant. Reads only
    manifest-referenced rounds, so it is safe while a crawl runs."""
    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    fetch_log = store.read_appended("fetch_log", ckpt.appended_rounds)
    if fetch_log is None:
        raise FileNotFoundError(f"no committed fetch_log rounds under {workdir}")
    from pegasus_spark.analytics.reports import fetch_volume_anomaly

    return [r.asDict() for r in fetch_volume_anomaly(fetch_log).collect()]


def crawl_recrawl_schedule(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
    now_ts: int | None = None, horizon_s: int = 7 * 86400, top: int = 10,
) -> dict[str, Any]:
    """Change-frequency re-crawl schedule over the COMMITTED store
    (reports.recrawl_schedule, the crawl-side consumer of the gated
    recrawl_priority): per-listing next-due times from the CDC change
    history, summarized for the CLI — listing/changed/due counts plus the
    ``top`` most-overdue listings (the only collect, bounded by ``top``
    with an explicit aid tie-break). ``now_ts`` defaults to the newest
    committed uts so the summary is a pure function of the store. Reads
    only manifest-referenced versions/rounds — safe while a crawl runs."""
    import pyspark.sql.functions as F

    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    # a store stopped before its first listing round has no apartments
    # version at all (read_apartments(-1) would raise a raw path error)
    if ckpt.apartments_version < 0:
        raise FileNotFoundError(f"no committed apartments under {workdir}")
    apartments = store.read_apartments(ckpt.apartments_version)
    changes = store.read_appended("changes", ckpt.appended_rounds)
    from pegasus_spark.analytics.reports import recrawl_schedule

    if now_ts is None:
        max_uts = apartments.agg(F.max("uts")).first()[0]
        if max_uts is None:
            raise FileNotFoundError(f"empty apartments table under {workdir}")
        now_ts = int(max_uts)
    sched = recrawl_schedule(apartments, changes, int(now_ts), horizon_s).cache()
    try:
        totals = sched.agg(
            F.count(F.lit(1)).alias("n_listings"),
            F.sum(F.when(F.col("n_changes") > 0, 1).otherwise(0)).alias("n_changed"),
            F.sum(F.when(F.col("due_now"), 1).otherwise(0)).alias("n_due_now"),
        ).first()
        top_rows = (
            sched.orderBy(F.desc("overdue_s"), F.asc("aid"), F.asc("region"))
            .limit(top)
            .collect()
        )
        return {
            "now_ts": int(now_ts),
            "horizon_s": horizon_s,
            "n_listings": int(totals["n_listings"]),
            "n_changed": int(totals["n_changed"]),
            "n_due_now": int(totals["n_due_now"]),
            "top_overdue": [r.asDict() for r in top_rows],
        }
    finally:
        sched.unpersist()


def crawl_politeness_audit(
    spark: SparkSession, workdir: str, store: FrontierStore | None = None,
    top: int = 20,
) -> dict[str, Any]:
    """Politeness-compliance audit over the COMMITTED fetch_log vs the
    persisted politeness_budget table (reports.politeness_audit): per-host
    min-gap and per-round budget checks, summarized for the CLI — host and
    violation totals plus the ``top`` worst hosts (violators first, then
    tightest observed gap, explicit host tie-break; the only collect,
    bounded by ``top``). A healthy store reports n_hosts_violating == 0;
    anything else is a fetch-path regression. Reads only
    manifest-referenced rounds — safe while a crawl runs."""
    import pyspark.sql.functions as F

    store = store or FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        raise FileNotFoundError(f"no committed checkpoint under {workdir}")
    fetch_log = store.read_appended("fetch_log", ckpt.appended_rounds)
    if fetch_log is None:
        raise FileNotFoundError(f"no committed fetch_log rounds under {workdir}")
    from pyspark.errors import AnalysisException

    budget_path = f"{workdir}/politeness_budget"
    try:
        budget = spark.read.parquet(budget_path)
    except AnalysisException as exc:  # path absent (pre-run store); real
        # read failures (corrupt files, permissions) propagate with their
        # traceback instead of masquerading as a missing table
        raise FileNotFoundError(f"no politeness_budget under {workdir}") from exc
    from pegasus_spark.analytics.reports import politeness_audit

    audit = politeness_audit(fetch_log, budget).cache()
    try:
        totals = audit.agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_hosts_violating"),
            F.sum("n_fetches").alias("n_fetches"),
            F.sum("n_gap_violations").alias("n_gap_violations"),
            F.sum("n_budget_violations").alias("n_budget_violations"),
        ).first()
        worst = (
            audit.orderBy(
                F.asc("ok"),
                F.desc("n_gap_violations"),
                F.desc("n_budget_violations"),
                # nulls LAST: a host with no measurable gaps (one fetch per
                # round) is the least interesting, not the tightest
                F.asc_nulls_last("min_gap_ms"),
                F.asc("host"),
            )
            .limit(top)
            .collect()
        )
        return {
            "n_hosts": int(totals["n_hosts"]),
            "n_hosts_violating": int(totals["n_hosts_violating"]),
            "n_fetches": int(totals["n_fetches"]),
            "n_gap_violations": int(totals["n_gap_violations"]),
            "n_budget_violations": int(totals["n_budget_violations"]),
            "worst_hosts": [r.asDict() for r in worst],
        }
    finally:
        audit.unpersist()


def host_lineage(spark: SparkSession, workdir: str) -> Any:
    """The committed host-level frontier-state breakdown as a DataFrame
    (host, state, url_cnt) — the queryable replacement for the round-2
    checkpoint-JSON host map."""
    store = FrontierStore(spark, workdir)
    ckpt = store.load_checkpoint()
    if ckpt is None or ckpt.lineage_version < 0:
        raise FileNotFoundError(f"no committed lineage table under {workdir}")
    return store.read_lineage(ckpt.lineage_version)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    compact = "--compact" in argv
    dup_report = "--dup-report" in argv
    span_report = "--span-report" in argv
    recrawl = "--recrawl" in argv
    politeness = "--politeness" in argv
    pii = "--pii" in argv
    datacard = "--datacard" in argv
    ablation = "--ablation" in argv
    sweep = "--sweep" in argv
    volume = "--volume" in argv
    vocab = "--vocab" in argv
    collocations = "--collocations" in argv
    history = "--history" in argv
    density = "--density" in argv
    argv = [
        a for a in argv
        if a not in (
            "--compact", "--dup-report", "--span-report", "--recrawl",
            "--politeness", "--pii", "--datacard", "--ablation", "--sweep",
            "--volume", "--vocab", "--collocations", "--history",
            "--density",
        )
    ]
    if len(argv) != 1:
        print(
            "usage: python -m pegasus_spark.crawler.status"
            " [--compact] [--dup-report] [--span-report] [--recrawl]"
            " [--politeness] [--pii] [--datacard] [--ablation] [--sweep]"
            " [--volume] [--vocab] [--collocations] [--history]"
            " [--density] <workdir>",
            file=sys.stderr,
        )
        return 2
    from pegasus_spark.session import get_spark

    spark = get_spark(app_name="pegasus_spark_status", shuffle_partitions=8)
    store = FrontierStore(spark, argv[0])
    out = crawl_status(spark, argv[0], store)
    if dup_report:
        try:
            out["dup_report"] = [
                r.asDict() for r in crawl_dup_report(spark, argv[0], store).collect()
            ]
            out["dup_histogram"] = [
                r.asDict()
                for r in crawl_dup_histogram(spark, argv[0], store).collect()
            ]
        except FileNotFoundError as exc:
            # a store stopped before its first listing round has no committed
            # items — a usage-level condition, not a traceback
            print(f"--dup-report: {exc}", file=sys.stderr)
            return 2
    if span_report:
        try:
            out["span_report"] = crawl_span_report(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--span-report: {exc}", file=sys.stderr)
            return 2
    if recrawl:
        try:
            out["recrawl"] = crawl_recrawl_schedule(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--recrawl: {exc}", file=sys.stderr)
            return 2
    if politeness:
        try:
            out["politeness"] = crawl_politeness_audit(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--politeness: {exc}", file=sys.stderr)
            return 2
    if pii:
        try:
            out["pii_report"] = crawl_pii_report(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--pii: {exc}", file=sys.stderr)
            return 2
    if datacard:
        try:
            out["datacard"] = crawl_datacard(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--datacard: {exc}", file=sys.stderr)
            return 2
    if ablation:
        try:
            out["rule_ablation"] = crawl_rule_ablation(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--ablation: {exc}", file=sys.stderr)
            return 2
    if sweep:
        try:
            out["quality_sweep"] = crawl_quality_sweep(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--sweep: {exc}", file=sys.stderr)
            return 2
    if volume:
        try:
            out["volume_anomaly"] = crawl_volume_anomaly(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--volume: {exc}", file=sys.stderr)
            return 2
    if vocab:
        try:
            out["caption_vocab"] = crawl_caption_vocab(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--vocab: {exc}", file=sys.stderr)
            return 2
    if collocations:
        try:
            out["caption_collocations"] = crawl_caption_collocations(
                spark, argv[0], store
            )
        except FileNotFoundError as exc:
            print(f"--collocations: {exc}", file=sys.stderr)
            return 2
    if history:
        try:
            out["price_history"] = crawl_price_history(spark, argv[0], store)
        except FileNotFoundError as exc:
            print(f"--history: {exc}", file=sys.stderr)
            return 2
    if density:
        try:
            out["image_cluster_density"] = crawl_image_cluster_density(
                spark, argv[0], store
            )
        except FileNotFoundError as exc:
            print(f"--density: {exc}", file=sys.stderr)
            return 2
    if compact:
        # maintenance: expire store versions no checkpoint references
        # (FrontierStore.compact — the Iceberg expire_snapshots equivalent;
        # versions above the committed round are treated as in-flight and
        # kept, so this is safe while a crawl is running)
        out["compacted"] = store.compact()
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
