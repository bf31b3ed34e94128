"""spark-submit entry point: export a committed crawl's images as deduped
WebDataset-style shards — the image-modality curation endgame.

The reference's closest analog is the export tool family
(/root/reference/src/pegasus/tools/export.py — read the committed tables,
produce the consumable artifact); this CLI is that surface for the IMAGE
side of the pipeline: committed items table → perceptual-hash keeper pass
(multimodal.image_dedup_keepers: phash Hamming pairs → connected components
→ highest-resolution image per cluster) → deterministic tar shards
(multimodal.write_image_shards: byte-budgeted, id-ordered, zero-mtime — a
re-run produces byte-identical archives, the crawl store's determinism
discipline applied to the training artifact).

    python scripts/run_image_export.py --store <crawl workdir> --out <dir>

Cluster launch mirrors run_crawl.py / run_curation.py:

    python scripts/make_pyfiles.py
    spark-submit --master <url> --py-files dist/pegasus_spark.zip \
        scripts/run_image_export.py --master inherit --store <dir> --out <dir>

Prints one JSON summary line: items in, keepers kept, dupes dropped, shard
count, payload bytes, and an order-free digest of the shard archives (md5
of the sorted per-shard md5s) so two runs — or two CLUSTERS — can assert
they exported the identical artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="committed crawl workdir")
    ap.add_argument("--out", required=True, help="output root (shards/ + manifest/)")
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master; 'inherit' = leave to spark-submit (cluster mode), "
        "default = local[$SPARK_GRAFT_CPUS]",
    )
    ap.add_argument(
        "--budget-bytes", type=int, default=1 << 20,
        help="per-shard byte budget (default 1 MiB)",
    )
    ap.add_argument(
        "--max-hamming", type=int, default=3,
        help="phash Hamming radius for the near-dup keeper pass (default 3)",
    )
    ap.add_argument(
        "--groups", type=int, default=16,
        help="salted packing groups (default 16)",
    )
    args = ap.parse_args(argv)

    from pegasus_spark.session import get_spark

    spark = get_spark(app_name="pegasus_image_export", master=args.master)

    import pyspark.sql.functions as F

    from pegasus_spark.crawler.frontier import FrontierStore
    from pegasus_spark.multimodal import (
        image_dedup_keepers,
        shard_manifest,
        write_image_shards,
    )

    store = FrontierStore(spark, args.store)
    ckpt = store.load_checkpoint()
    if ckpt is None:
        print(json.dumps({"error": f"no committed checkpoint under {args.store}"}))
        sys.exit(2)
    items = store.read_appended("items", ckpt.appended_rounds)
    if items is None:
        print(json.dumps({"error": f"no committed items rounds under {args.store}"}))
        sys.exit(2)

    # A resumed / CDC store can re-append an image_id (a detail page
    # revisited in a later round re-emits its items), so first canonicalize
    # to ONE row per image on NARROW columns — the §4.3 canonical-order
    # discipline (caption, fmt ascending), bytes never enter this window.
    from pyspark.sql import Window

    narrow = items.select("image_id", "caption", "fmt", "phash", "w", "h")
    wnd = Window.partitionBy("image_id").orderBy("caption", "fmt")
    canon = (
        narrow.withColumn("_rn", F.row_number().over(wnd))
        .filter("_rn = 1")
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    n_items = canon.count()
    # keeper pass rides narrow rows (ids + hashes + dims); bytes stay put
    keepers = image_dedup_keepers(
        canon, max_hamming=args.max_hamming
    ).filter("is_keeper").select("image_id")
    # payload joins back LATE, keyed by the canonical (id, caption, fmt)
    # triple; the residual dropDuplicates is content-deterministic — every
    # surviving row for an id is byte-identical (bytes are a function of
    # image_id in this store, and caption/fmt are pinned by the canon join)
    keep_keys = canon.join(keepers, "image_id").select(
        "image_id", "caption", "fmt"
    )
    payload = (
        items.join(keep_keys, ["image_id", "caption", "fmt"])
        .select("image_id", "bytes", "fmt", "caption")
        .dropDuplicates(["image_id"])
    )
    shards = write_image_shards(
        payload, budget_bytes=args.budget_bytes, n_groups=args.groups
    ).localCheckpoint(eager=True)

    os.makedirs(args.out, exist_ok=True)
    shards.write.mode("overwrite").parquet(f"{args.out}/shards")
    from pegasus_spark.multimodal import pack_image_shards

    manifest = shard_manifest(
        pack_image_shards(
            payload, budget_bytes=args.budget_bytes, n_groups=args.groups
        )
    )
    manifest.write.mode("overwrite").parquet(f"{args.out}/manifest")

    agg = shards.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n_items").alias("n_kept"),
        F.sum(F.length("tar")).alias("tar_bytes"),
        # order-free artifact digest: md5 over the SORTED per-shard md5s
        F.md5(
            F.concat_ws(",", F.array_sort(F.collect_list(F.md5("tar"))))
        ).alias("digest"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "items_in": n_items,
                "keepers": int(agg["n_kept"]),
                "dupes_dropped": n_items - int(agg["n_kept"]),
                "n_shards": int(agg["n_shards"]),
                "tar_bytes": int(agg["tar_bytes"]),
                "digest": agg["digest"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
