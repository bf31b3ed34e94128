"""spark-submit entry point: run (or resume) a crawl against a store.

Replaces the reference's master-driven job launch
(/root/reference/src/pegasus/master/mastermain.go, taskmgr HTTP dispatch):
one driver script owns the whole round loop; executors are Spark's problem.

Local sandbox (sanity run, builds a seeded synthetic fixture):

    python scripts/run_crawl.py --store /tmp/crawl_store --fixture /tmp/fx

Cluster (the north-rule launch path — `--master inherit` leaves the master
to spark-submit; the zip ships the package to every executor):

    python scripts/make_pyfiles.py
    spark-submit --master <url> --deploy-mode client \
        --py-files dist/pegasus_spark.zip \
        scripts/run_crawl.py --master inherit \
        --store /mnt/shared/pegasus/store --fixture /mnt/shared/pegasus/fixture

--store/--fixture must be on a filesystem the DRIVER can reach with POSIX
calls (local disk, NFS, a fuse mount): FrontierStore's manifest commit is
os.replace-atomic by design (the sandbox's Iceberg stand-in, see CLAUDE.md).
A real deployment swaps FrontierStore for Iceberg tables on object storage;
this CLI is unchanged by that swap.

Resume: rerunning with the same --store continues from the committed
checkpoint manifest (crash-safe by the store's atomic-rename commit; see
tests/test_resume.py) — the CLI itself takes no resume flag because resume
is the default and only behavior when a checkpoint exists.

Prints one JSON summary line (rounds, pages, urls, wall) on completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="store root (checkpointed)")
    ap.add_argument(
        "--fixture",
        required=True,
        help="fixture dir with site_pages_r1.parquet + items_r1.parquet "
        "(built deterministically if absent)",
    )
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master; 'inherit' = leave to spark-submit (cluster mode), "
        "default = local[$SPARK_GRAFT_CPUS]",
    )
    ap.add_argument(
        "--max-rounds",
        type=int,
        default=0,
        help="0 = run to empty frontier (unbounded); N > 0 stops after N rounds",
    )
    ap.add_argument("--n-partitions", type=int, default=None)
    ap.add_argument("--now-ts", type=int, default=1_700_000_000)
    ap.add_argument(
        "--scale",
        default="small",
        choices=["small", "large", "weak1", "weak4"],
        help="fixture scale preset (pegasus_spark.crawler.fixtures SCALES)",
    )
    args = ap.parse_args()

    from pegasus_spark.session import get_spark

    spark = get_spark(app_name="pegasus_crawl", master=args.master)

    from pegasus_spark.crawler.fixtures import (
        HOSTS,
        ROOT_HOST,
        SCALES,
        budget_df,
        make_site_spec,
        write_fixture,
    )
    from pegasus_spark.crawler.scheduler import CrawlScheduler

    p = SCALES[args.scale]
    spec = make_site_spec(
        n_districts=p["n_districts"],
        regions_per_district=p["regions_per_district"],
        pages_per_region_max=p["pages_per_region_max"],
        image_dims=p["image_dims"],
    )
    for h in HOSTS:
        spec.budget[h] = p["budget_hot"] if h == ROOT_HOST else p["budget_cold"]
    # the marker records WHICH scale built the fixture: reusing a fixture
    # with a different --scale would silently mismatch the scheduler budget
    # (built fresh from the new scale's spec) against stale pages on disk
    marker = os.path.join(args.fixture, "DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            built_scale = f.read().strip()
        if built_scale != args.scale:
            sys.exit(
                f"fixture {args.fixture} was built with --scale {built_scale}; "
                f"rerun with that scale or point --fixture at a fresh dir"
            )
    else:
        os.makedirs(args.fixture, exist_ok=True)
        write_fixture(spark, spec, args.fixture, round_no=1)
        with open(marker, "w") as f:
            f.write(args.scale)

    kw = {}
    if args.n_partitions is not None:
        kw["n_partitions"] = args.n_partitions
    sched = CrawlScheduler(
        spark,
        args.store,
        page_store_path=f"{args.fixture}/site_pages_r1.parquet",
        image_store_path=f"{args.fixture}/items_r1.parquet",
        budget=budget_df(spark, spec),
        seed_urls=[spec.root_url],
        now_ts=args.now_ts,
        **kw,
    )
    # run() owns resume, the legacy-manifest upgrade, the finished flag, and
    # the crawl_runs history row — re-implementing the loop here would skip
    # all four (status.py would report a drained store as 'running' forever)
    prior = sched.store.load_checkpoint()
    start_round = prior.round if prior else 0
    # 0 = drain: the loop exits on its own when the frontier empties (the
    # scheduler sets the finished flag), so "unbounded" is just a bound the
    # crawl can never hit before draining
    res = sched.run(max_rounds=args.max_rounds or sys.maxsize)
    final = sched.store.load_checkpoint()
    print(
        json.dumps(
            {
                "resumed_from_round": start_round,
                "rounds_run": res.rounds,
                "final_round": final.round,
                "pages_fetched": res.pages_fetched,
                "urls_enqueued": res.urls_enqueued,
                "finished": final.finished,
                "wall_s": round(res.wall_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
