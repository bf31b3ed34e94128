"""spark-submit entry point: run the dedup endgame over a documents table
and materialize the artifact a training run consumes.

The reference's closest analog is the report/export tool family
(/root/reference/src/pegasus/tools/report.py, tools/export.py — read the
committed tables, produce the consumable artifact); this CLI is that surface
for the curation pipeline: cross-modal near-dup clusters (minhash ∪ simhash
∪ embedding sign-LSH evidence) → quality-argmax keeper selection → the
source-partitioned curated corpus plus the CDC-style dropped-docs audit
table (pegasus_spark.textops.dedup.curate_corpus / write_curated).

    python scripts/run_curation.py --sf-dir /root/testdata/sf0.01 --out /tmp/curated

Cluster launch mirrors run_crawl.py:

    python scripts/make_pyfiles.py
    spark-submit --master <url> --py-files dist/pegasus_spark.zip \
        scripts/run_curation.py --master inherit --sf-dir <dir> --out <dir>

Prints one JSON summary line: docs in, survivors, dropped, per-source rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir", required=True,
        help="dir holding documents.parquet (+ embeddings.parquet for the "
        "embedding evidence channel)",
    )
    ap.add_argument("--out", required=True, help="output root (curated/ + dropped/)")
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master; 'inherit' = leave to spark-submit (cluster mode), "
        "default = local[$SPARK_GRAFT_CPUS]",
    )
    ap.add_argument(
        "--store",
        default=None,
        metavar="DIR",
        help="FrontierStore root for the write-once `clusters` table: the "
        "cluster assignment is read back from the store when its committed "
        "input fingerprint matches, else built once and committed — a second "
        "run against the same inputs does ZERO connected-component jobs",
    )
    ap.add_argument(
        "--scrub-spans",
        type=int,
        default=0,
        metavar="N",
        help="after keeper selection, exact-substring-scrub the SURVIVORS: "
        "remove every non-canonical occurrence of a corpus-repeated N-token "
        "span (textops.dedup.span_scrub) so residual cloned passages inside "
        "kept docs go too; 0 (default) = off",
    )
    args = ap.parse_args(argv)

    from pegasus_spark.session import get_spark

    spark = get_spark(app_name="pegasus_curation", master=args.master)

    import pegasus_spark.analytics.pipeline_queries as PQ
    from pegasus_spark.analytics.pipeline_queries import _docs, _keeper_df
    from pegasus_spark.textops.dedup import curate_corpus, write_curated

    if args.store:
        from pegasus_spark.crawler.frontier import FrontierStore

        PQ.use_cluster_store(FrontierStore(spark, args.store))

    docs = _docs(spark, args.sf_dir)
    curated, dropped = curate_corpus(docs, _keeper_df(spark, args.sf_dir))
    if args.scrub_spans:
        # span canonicality is decided over the SURVIVOR set (post cluster
        # dedup): the cluster pass already removed whole near-dup docs, so
        # the scrub targets passages cloned BETWEEN kept docs
        import pyspark.sql.functions as F

        from pegasus_spark.textops.dedup import span_scrub

        sc = span_scrub(curated.select("doc_id", "text"), n=args.scrub_spans)
        curated = curated.drop("text").join(
            sc.select(
                "doc_id", F.col("text_clean").alias("text"), "n_removed"
            ),
            "doc_id",
        )
    write_curated(curated, dropped, args.out)

    # read BACK from the written artifact so the summary reports what a
    # consumer will actually see, not the in-memory plan
    surv = spark.read.parquet(f"{args.out}/curated")
    drop = spark.read.parquet(f"{args.out}/dropped")
    import pyspark.sql.functions as F

    per_source = {
        r["source"]: int(r["n"])
        for r in surv.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    summary = {
        "docs_in": docs.count(),
        "survivors": surv.count(),
        "dropped": drop.count(),
        "survivors_by_source": dict(sorted(per_source.items())),
        "out": args.out,
    }
    if args.store:
        # cluster_builds == 0 ⇒ this run served the assignment entirely from
        # the store's committed table (no connected-component jobs ran)
        summary["cluster_builds"] = PQ._CC_BUILD_COUNT
        summary["clusters_source"] = "built" if PQ._CC_BUILD_COUNT else "store"
        summary["clusters_version"] = (PQ._CLUSTER_STORE.load_clusters_meta() or {}).get(
            "version"
        )
    if args.scrub_spans:
        summary["spans_scrubbed_tokens"] = int(
            surv.agg(F.sum("n_removed")).collect()[0][0] or 0
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
