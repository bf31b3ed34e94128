"""Pure-pandas oracle for the crawl pipeline (SURVEY §5.4's "expected golden
outputs derivable by a pure-pandas oracle").

Independently re-derives, WITHOUT Spark, what a correct crawl of the seed=42
fixture must produce: the URL-seen set, the apartments table after each run,
and the CDC change/meta-change rows between runs. Shares only the fixture's
card *generator* (the site content ground truth) with the engine — the
crawler *semantics* (dedup, malformed-drop, nts preservation, diff fields,
visitcnt blacklist) are reimplemented here from the reference's behavior
(/root/reference/src/pegasus/lianjia/updatedb.go:251-379,
apartments.go:234-295)."""

from __future__ import annotations

from pegasus_spark.crawler.fixtures import SiteSpec, cards_for_page

META_DIFF_FIELDS = [
    "location", "price", "size", "total", "subway", "station", "smeter",
    "floor", "tfloor", "year", "withlift",
]


def crawlable_regions(spec: SiteSpec) -> list[str]:
    """Regions whose pages are actually fetchable: every unique region except
    the fully robots-blocked one."""
    return [a for a in spec.regions if a != spec.blocked_region]


def expected_url_set(spec: SiteSpec) -> set[str]:
    """Every canonical URL that must end up in the frontier (any state)."""
    urls = {spec.root_url, "https://h0.lianjia.test/private/stats/"}
    for d in spec.districts:
        if d != "shanghaizhoubian":
            urls.add(spec.district_url(d))
    for r in spec.regions.values():
        urls.add(r.url)
        if r.abbr != spec.blocked_region:
            for p in range(1, r.total_page + 1):
                urls.add(r.page_url(p))
    return urls


def expected_fetched_set(spec: SiteSpec) -> set[str]:
    """URLs that must be fetched (URL-seen minus robots-blocked)."""
    blocked = {spec.regions[spec.blocked_region].url,
               "https://h0.lianjia.test/private/stats/"}
    return expected_url_set(spec) - blocked


def expected_cards(spec: SiteSpec, round_no: int = 1) -> dict[tuple[str, str], dict]:
    """(region, aid) → card dict after dedup (first (page, pos) wins) and
    malformed-drop, across all crawlable listing pages."""
    out: dict[tuple[str, str], dict] = {}
    for abbr in crawlable_regions(spec):
        r = spec.regions[abbr]
        for page in range(1, r.total_page + 1):
            for pos, card in enumerate(cards_for_page(abbr, page, round_no)):
                if card["_price"] is None:  # malformed → skipped (F5)
                    continue
                key = (abbr, card["aid"])
                if key not in out:  # first-seen-wins (D2)
                    out[key] = {**card, "_region": abbr, "_page": page, "_pos": pos}
    return out


def card_to_apartment(card: dict, nts: int, uts: int) -> dict:
    return {
        "location": card["location"].replace(" ", ""),
        "aid": card["aid"],
        "price": card["_price"],
        "size": str(card["_size"]),
        "total": card["_total"],
        "nts": nts,
        "uts": uts,
        "subway": card["_subway"],
        "station": "",
        "smeter": 0,
        "floor": card["_floor"],
        "tfloor": card["_tfloor"],
        "year": card["_year"],
        "withlift": card["_withlift"],
        "visitcnt": card["visitcnt"],
        "region": card["_region"],
    }


def expected_apartments_run1(spec: SiteSpec, ts1: int) -> dict[tuple[str, str], dict]:
    return {
        k: card_to_apartment(c, nts=ts1, uts=ts1)
        for k, c in expected_cards(spec, 1).items()
    }


def expected_after_run2(
    spec: SiteSpec, ts1: int, ts2: int
) -> tuple[dict[tuple[str, str], dict], list[dict], list[dict]]:
    """(final apartments, changes rows, meta_change rows) after run 2 over
    the mutated site — J1 nts preservation, J2 price/total diff, J3 EAV diff
    with the visitcnt blacklist."""
    run1 = expected_apartments_run1(spec, ts1)
    cards2 = expected_cards(spec, 2)
    final: dict[tuple[str, str], dict] = {}
    changes: list[dict] = []
    meta: list[dict] = []
    for key, old in run1.items():
        if key not in cards2:
            final[key] = old  # absent listings stay (no delete)
    for key, card in cards2.items():
        if key in run1:
            old = run1[key]
            new = card_to_apartment(card, nts=old["nts"], uts=ts2)  # nts preserved
            if old["price"] != new["price"] or old["total"] != new["total"]:
                changes.append(
                    {"aid": old["aid"], "old_price": old["price"], "new_price": new["price"],
                     "old_total": old["total"], "new_total": new["total"], "ts": ts2,
                     "region": old["region"]}
                )
            for f in META_DIFF_FIELDS:
                if str(old[f]) != str(new[f]):
                    meta.append(
                        {"aid": old["aid"], "item": f, "old": str(old[f]),
                         "new": str(new[f]), "ts": ts2, "region": old["region"]}
                    )
            final[key] = new
        else:
            final[key] = card_to_apartment(card, nts=ts2, uts=ts2)
    return final, changes, meta
