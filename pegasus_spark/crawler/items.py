"""Image+caption payload extraction (BASELINE.json input_hint schema).

The items table ``(image_id, bytes, w, h, fmt, caption, phash)`` rides where
pegasus carried Apartment rows. Cards reference images by ``image_id``; the
"image download" is a join against the image store by id — the payload
``bytes`` column enters the plan ONLY here, after the card-side projections,
so binary blobs never travel through the card dedup/CDC shuffles (SURVEY
§7.4 "keep bytes out of wide shuffles: fetch payload late via join-back").

Decoding + phash run vectorized in one mapInPandas pass (Arrow batches of
whole images — the pandas-UDF rebuild of the reference's per-card Go parse,
apartments.go:299-419)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from pegasus_spark.crawler.codec import decode_image, image_dims, phash64
from pegasus_spark.crawler.fixtures import ITEM_SCHEMA


def extract_items(
    cards: DataFrame, image_store: DataFrame, n_partitions: int | None = None,
    broadcast_cards: bool = False,
) -> DataFrame:
    """cards (aid, image_id, caption, …) ⋈ image_store (image_id, bytes, fmt)
    → decoded item rows. The caption comes from the CARD (what the crawler
    parsed); dims/fmt/phash are recomputed from the fetched bytes — the
    per-row invariant tests compare them against the store's ground truth.

    ``broadcast_cards=True`` (caller decides from the known card count): the
    tiny card side broadcasts and the image BYTES never shuffle at all —
    they flow scan → decode in place (measured 4× faster at the weak-scaling
    point; the byte shuffle was the round's biggest non-scaling cost).
    Decode parallelism is then the scan partitioning
    (spark.sql.files.maxPartitionBytes governs it — at 100 TB that is the
    right knob, one decode task per scan split).

    Otherwise (card side too big to broadcast) the join shuffles on
    image_id and ``n_partitions`` pins the decode parallelism: decode+phash
    is CPU-bound Python, and AQE's byte-based coalescing under-parallelizes
    it."""
    if broadcast_cards:
        import pyspark.sql.functions as F

        joined = image_store.select("image_id", "bytes", "fmt").join(
            F.broadcast(cards.select("image_id", "caption")), "image_id"
        )
    else:
        joined = cards.select("image_id", "caption").join(
            image_store.select("image_id", "bytes", "fmt"), "image_id"
        )
        if n_partitions:
            # hash-repartition on the key, NOT round-robin repartition(n):
            # round-robin locally sorts rows before exchange (retry
            # determinism, spark.sql.execution.sortBeforeRepartition) — a
            # full sort of the binary payload column
            joined = joined.repartition(n_partitions, "image_id")

    def decode(batches):
        for pdf in batches:
            rows = []
            for image_id, caption, data, fmt in zip(
                pdf["image_id"], pdf["caption"], pdf["bytes"], pdf["fmt"]
            ):
                data = bytes(data)
                h, w = image_dims(data)
                arr = decode_image(data)
                rows.append((image_id, data, w, h, fmt, caption, phash64(arr)))
            yield pd.DataFrame(rows, columns=[f.name for f in ITEM_SCHEMA.fields])

    return joined.mapInPandas(decode, ITEM_SCHEMA)
