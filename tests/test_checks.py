"""Per-check golden fixtures (FIXTURES.md §3) over tiny tag maps.

Each case derives from cited semantics in /root/reference/checks.py —
the reference itself has no tests (SURVEY.md §5).
"""

import pytest
from pyspark.sql import functions as F

from osm_addr_bot_spark.checks import all_categories, fan_out_checks, selector_expr
from tests.conftest import tags_df


def _hits(spark, cases, fidelity=False):
    """Run the fan-out over bare tag rows; return {case_id: set(check_id)}."""
    df = tags_df(spark, cases)
    out = fan_out_checks(df, fidelity=fidelity).select("case_id", "check_id").collect()
    res = {cid: set() for cid, _ in cases}
    for r in out:
        res[r["case_id"]].add(r["check_id"])
    return res


def test_bad_postcode_format(spark):
    # reference checks.py:10, 50-62; FIXTURES.md §3
    cases = [
        ("ok1", {"addr:postcode": "12-345"}),
        ("ok2", {"addr:postcode": "12-345;67-890"}),
        ("ok3", {"addr:postcode": "12-345,67-890"}),
        ("bad1", {"addr:postcode": "12345"}),
        ("bad2", {"addr:postcode": "12-3456"}),
        ("bad3", {"addr:postcode": "12-345;"}),
        ("bad4", {"addr:postcode": "ab-cde"}),
        ("bad5", {"addr:postcode": "1-234"}),
    ]
    h = _hits(spark, cases)
    for cid, _ in cases:
        expect = cid.startswith("bad")
        assert ("BAD_POSTCODE_FORMAT" in h[cid]) == expect, cid


def test_bad_city_with_place_pre(spark):
    cases = [
        ("diff", {"addr:city": "Warszawa", "addr:place": "Wola"}),
        ("same", {"addr:city": "Warszawa", "addr:place": "Warszawa"}),
        ("cityonly", {"addr:city": "Warszawa"}),
    ]
    h = _hits(spark, cases)
    assert "BAD_CITY_WITH_PLACE" in h["diff"]
    assert "BAD_CITY_WITH_PLACE" not in h["same"]
    assert "BAD_CITY_WITH_PLACE" not in h["cityonly"]


def test_city_with_place_mistype(spark):
    # normalize: strip -> lower -> collapse whitespace (utils.py:43-47)
    cases = [
        ("lower", {"addr:city": "Warszawa", "addr:place": "warszawa"}),
        ("trail", {"addr:city": "Warszawa", "addr:place": "Warszawa  "}),
        ("inner", {"addr:city": "Nowa  Wieś", "addr:place": "nowa wieś"}),
        ("differ", {"addr:city": "Warszawa", "addr:place": "Kraków"}),
        ("exact", {"addr:city": "Warszawa", "addr:place": "Warszawa"}),
    ]
    h = _hits(spark, cases)
    for cid in ("lower", "trail", "inner"):
        assert "CITY_WITH_PLACE_MISTYPE" in h[cid], cid
    for cid in ("differ", "exact"):
        assert "CITY_WITH_PLACE_MISTYPE" not in h[cid], cid


def test_number_without_street(spark):
    cases = [
        ("flag", {"addr:housenumber": "1", "addr:city": "X"}),
        ("street", {"addr:housenumber": "1", "addr:city": "X", "addr:street": "S"}),
        ("place", {"addr:housenumber": "1", "addr:city": "X", "addr:place": "P"}),
        ("nocity", {"addr:housenumber": "1"}),
    ]
    h = _hits(spark, cases)
    assert "NUMBER_WITHOUT_STREET" in h["flag"]
    for cid in ("street", "place", "nocity"):
        assert "NUMBER_WITHOUT_STREET" not in h[cid], cid


def test_place_with_street_selector_only(spark):
    cases = [
        ("both", {"addr:place": "P", "addr:street": "S"}),
        ("placeonly", {"addr:place": "P"}),
    ]
    h = _hits(spark, cases)
    assert "PLACE_WITH_STREET" in h["both"]
    assert "PLACE_WITH_STREET" not in h["placeonly"]


def test_street_name_with_prefix(spark):
    cases = [
        ("p1", {"addr:street": "ul. Polna"}),
        ("p2", {"addr:street": "ulica Polna"}),
        ("p3", {"addr:street": "ul Polna"}),
        ("no", {"addr:street": "Ulanowska"}),
        ("no2", {"addr:street": "Polna"}),
    ]
    h = _hits(spark, cases)
    for cid in ("p1", "p2", "p3"):
        assert "STREET_NAME_WITH_PREFIX" in h[cid], cid
    for cid in ("no", "no2"):
        assert "STREET_NAME_WITH_PREFIX" not in h[cid], cid


def test_parcel_locker_with_name(spark):
    cases = [
        ("flag", {"brand:wikidata": "Q110970254", "name": "Paczkomat X"}),
        ("otherq", {"brand:wikidata": "Q42", "name": "X"}),
        ("noname", {"brand:wikidata": "Q110970254"}),
    ]
    h = _hits(spark, cases)
    assert "PARCEL_LOCKER_WITH_NAME" in h["flag"]
    assert "PARCEL_LOCKER_WITH_NAME" not in h["otherq"]
    assert "PARCEL_LOCKER_WITH_NAME" not in h["noname"]


def test_website_repeated_protocol(spark):
    cases = [
        ("w", {"website": "https://https://x.pl"}),
        ("u", {"url": "http://https://x.pl"}),
        ("c", {"contact:website": "https://https://x.pl"}),
        ("ok", {"website": "https://x.pl"}),
        ("other", {"shop": "bakery"}),
    ]
    h = _hits(spark, cases)
    for cid in ("w", "u", "c"):
        assert "WEBSITE_WITH_REPEATED_PROTOCOL" in h[cid], cid
    assert "WEBSITE_WITH_REPEATED_PROTOCOL" not in h["ok"]
    assert "WEBSITE_WITH_REPEATED_PROTOCOL" not in h["other"]


def test_website_url_shortener(spark):
    cases = [
        ("bitly", {"website": "https://bit.ly/abc"}),
        ("caps", {"website": "HTTPS://TINYURL.COM/x"}),
        ("gmaps", {"website": "https://goo.gl/maps/x"}),   # negative lookahead
        ("googl", {"website": "https://goo.gl/x"}),
        ("anchored", {"website": "https://example.com/bit.ly/x"}),
        ("tco", {"url": "https://t.co/abc"}),
    ]
    h = _hits(spark, cases)
    for cid in ("bitly", "caps", "googl", "tco"):
        assert "WEBSITE_URL_SHORTENER" in h[cid], cid
    for cid in ("gmaps", "anchored"):
        assert "WEBSITE_URL_SHORTENER" not in h[cid], cid


def test_construction_not_removed_intended_vs_fidelity(spark):
    # quirk Q1/Q2 (SURVEY.md §5): intended semantics by default,
    # dead-check behavior in fidelity mode
    cases = [
        ("match", {"construction": "house", "building": "house"}),
        ("differ", {"construction": "house", "building": "yes"}),
        ("absent", {"construction": "house"}),  # Q2: absent never matches
        ("prop", {"proposed": "motorway", "highway": "motorway"}),
    ]
    h = _hits(spark, cases)
    assert "CONSTRUCTION_NOT_REMOVED" in h["match"]
    assert "CONSTRUCTION_NOT_REMOVED" not in h["differ"]
    assert "CONSTRUCTION_NOT_REMOVED" not in h["absent"]
    assert "PROPOSED_NOT_REMOVED" in h["prop"]

    hf = _hits(spark, cases, fidelity=True)
    for cid, _ in cases:
        assert "CONSTRUCTION_NOT_REMOVED" not in hf[cid]
        assert "PROPOSED_NOT_REMOVED" not in hf[cid]


def test_selector_engine(spark):
    # reference check_base.py:28-45; FIXTURES.md §3 'Selector engine'
    df = tags_df(
        spark,
        [
            ("addrcity", {"addr:city": "X"}),
            ("address", {"address": "X"}),
            ("none", {"shop": "bakery"}),
        ],
    )

    def got(selectors, partial):
        rows = df.filter(selector_expr(F.col("tags"), selectors, partial)).collect()
        return {r["case_id"] for r in rows}

    # glob addr:* matches addr:city but NOT 'address' (fnmatch ':' literal)
    assert got(("addr:*",), partial=False) == {"addrcity"}
    # full requires all
    assert got(("addr:city", "shop"), partial=False) == set()
    # partial: any
    assert got(("addr:city", "shop"), partial=True) == {"addrcity", "none"}
    # empty selector set -> False in BOTH modes: the reference early-returns
    # when static and dynamic are empty (check_base.py:29-30); its vacuous
    # partial branch (check_base.py:41) is unreachable
    assert got((), partial=False) == set()
    assert got((), partial=True) == set()


def test_category_selector_prefilter(spark):
    """ADDRESS category selector addr:* gates its checks
    (reference category.py:22-23)."""
    cases = [
        # would match BAD_POSTCODE selector but has no addr:* key? impossible —
        # postcode IS addr:*; use a website check under SYNTAX (no cat selector)
        ("syntax", {"website": "https://bit.ly/x"}),
    ]
    h = _hits(spark, cases)
    assert "WEBSITE_URL_SHORTENER" in h["syntax"]


def test_fanout_multi_hit(spark):
    """One element claimed by several checks appears once per check in
    the long format."""
    cases = [
        (
            "multi",
            {
                "addr:place": "P",
                "addr:street": "ul. Polna",
                "addr:housenumber": "1",
                "addr:postcode": "bad",
            },
        )
    ]
    h = _hits(spark, cases)
    assert {
        "PLACE_WITH_STREET",
        "STREET_NAME_WITH_PREFIX",
        "BAD_POSTCODE_FORMAT",
        "DUPLICATED",
        "UNKNOWN_STREET_NAME",
    } <= h["multi"]
