"""Page parsing as Catalyst column expressions (SURVEY §2.2 P1-P9).

The reference parses HTML card-by-card in Go
(parseApartment, /root/reference/src/pegasus/lianjia/apartments.go:299-419:
6 regex extractions, 2 enum derivations, comma-strip, casts). Here page
bodies are JSON (fixture format) and every extraction is a built-in
expression — ``F.from_json`` + ``regexp_extract`` + ``try_cast`` — so the
whole parse stage stays inside whole-stage codegen; zero Python in the plan.

``try_cast`` (not ``cast``) everywhere: Spark 4 ANSI mode raises on bad
casts, while the reference *skips* malformed cards row-tolerantly
(apartments.go:288-295) — a null parse result routed to the error side-output
reproduces that.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CARD_SCHEMA = ArrayType(
    StructType(
        [
            StructField("aid", StringType()),
            StructField("location", StringType()),
            StructField("price_text", StringType()),
            StructField("size_text", StringType()),
            StructField("total_text", StringType()),
            StructField("position", StringType()),
            StructField("lift", StringType()),
            StructField("tags", StringType()),
            StructField("visitcnt", IntegerType()),
            StructField("image_id", StringType()),
            StructField("caption", StringType()),
        ]
    )
)

PAGE_BODY_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("children", ArrayType(StringType())),
        StructField("page_data", StringType()),
        StructField("cards", CARD_SCHEMA),
    ]
)


def parsed_body(df: DataFrame, body_col: str = "body") -> DataFrame:
    return df.withColumn("parsed", F.from_json(F.col(body_col), PAGE_BODY_SCHEMA))


def child_links(df: DataFrame) -> DataFrame:
    """root/district pages → one row per child URL (pre-canonical form)."""
    return df.select(
        F.col("url").alias("parent_url"),
        F.col("kind").alias("parent_kind"),
        F.explode("parsed.children").alias("url"),
    )


def total_page_col() -> Column:
    """P6: regex `"totalPage":(\\d+)` from the embedded JSON attr
    (region_maxpage.go:237-264)."""
    return F.regexp_extract(F.col("parsed.page_data"), r'"totalPage":(\d+)', 1).try_cast("int")


def abbr_from_url(url_col: str = "url") -> Column:
    """P4: `/ershoufang/gumei/` → `gumei` (links.go:27-38)."""
    return F.regexp_extract(F.col(url_col), r"/ershoufang/([^/]+)/", 1)


_FLOOR_MAP = {"低": "L", "中": "M", "高": "H"}
_LIFT_MAP = {"有电梯": "Y", "无电梯": "N"}


def parse_cards(df: DataFrame) -> DataFrame:
    """listing pages → one Apartment row per card (SURVEY §1.2 schema).

    Column-for-column rebuild of parseApartment (apartments.go:299-419):
    - price: comma-strip + int (P3, apartments.go:348-359); malformed → null
    - size: kept as STRING (apartments.go:329-335)
    - total: float parse truncated to int (apartments.go:360-374)
    - floor/tfloor/year: P7 position regex (apartments.go:426-452)
    - withlift: Y/N/U enum (apartments.go:336-341)
    - subway: presence → 99/0 (P8, apartments.go:454-467)
    - location: strip all whitespace (P9, apartments.go:421-424)
    """
    c = df.select(
        "url",
        "host",
        abbr_from_url().alias("region"),
        F.regexp_extract("url", r"pg(\d+)co32", 1).try_cast("int").alias("page"),
        F.posexplode("parsed.cards").alias("pos", "card"),
    )
    floor_raw = F.regexp_extract("card.position", r"(低|中|高)楼层", 1)
    lift = F.col("card.lift")
    return c.select(
        "url",
        "host",
        "region",
        "page",
        "pos",
        F.col("card.aid").alias("aid"),
        F.regexp_replace("card.location", r"\s", "").alias("location"),
        F.regexp_replace(F.regexp_extract("card.price_text", r"([0-9,]+)元/平米", 1), ",", "")
        .try_cast("int")
        .alias("price"),
        F.regexp_extract("card.size_text", r"([0-9.]+)平米", 1).alias("size"),
        F.regexp_extract("card.total_text", r"([0-9.]+)万", 1)
        .try_cast("double")
        .try_cast("int")
        .alias("total"),
        F.when(floor_raw == "低", "L")
        .when(floor_raw == "中", "M")
        .when(floor_raw == "高", "H")
        .otherwise("U")
        .alias("floor"),
        F.coalesce(
            F.regexp_extract("card.position", r"共(\d+)层", 1).try_cast("int"), F.lit(0)
        ).alias("tfloor"),
        F.coalesce(
            F.regexp_extract("card.position", r"(\d{4})年建", 1).try_cast("int"), F.lit(0)
        ).alias("year"),
        F.when(lift == "有电梯", "Y").when(lift == "无电梯", "N").otherwise("U").alias("withlift"),
        F.when(F.col("card.tags").contains("近地铁"), 99).otherwise(0).alias("subway"),
        F.lit("").alias("station"),
        F.lit(0).alias("smeter"),
        F.coalesce("card.visitcnt", F.lit(0)).alias("visitcnt"),
        F.col("card.image_id").alias("image_id"),
        F.col("card.caption").alias("caption"),
    )


def split_malformed(cards: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F5 row tolerance: null price = failed parse → error side-output
    (the reference logs + skips, apartments.go:288-295). A null/empty region
    is equally malformed: region is the apartments partition key, so such a
    row would land in the default Hive partition — one the dirty-region
    MERGE never reads — and silently clobber prior rows there. Route it to
    the errors table instead (the reference's region always derives from the
    listing URL, so an empty one is a parse failure by definition)."""
    good = F.col("price").isNotNull() & F.col("region").isNotNull() & (F.col("region") != "")
    ok = cards.filter(good)
    bad = cards.filter(~good).select(
        "url", "region", "page", "pos", "aid",
        F.when(F.col("price").isNull(), "price_parse")
        .otherwise("empty_region")
        .alias("error"),
    )
    return ok, bad


def dedupe_cards(cards: DataFrame) -> DataFrame:
    """D2 first-seen-wins: duplicate aids across pages of one region keep the
    lowest (page, pos) — the reference's newest-sort-first-page-wins dedup
    (apartments.go:234-247), made parallelism-independent by an explicit
    canonical ordering tie-break (SURVEY §4.3)."""
    from pyspark.sql import Window

    w = Window.partitionBy("region", "aid").orderBy(F.asc("page"), F.asc("pos"))
    return (
        cards.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1).drop("_rk")
    )
