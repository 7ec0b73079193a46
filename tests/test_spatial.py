"""Spatial-stage goldens (FIXTURES.md §4) with hand-placed coordinates
at safe margins around every threshold."""

import math

from pyspark.sql import functions as F

from osm_addr_bot_spark.operators.duplicates import duplicates_stage
from osm_addr_bot_spark.operators.guilt import filter_guilty, guilty_changesets
from osm_addr_bot_spark.operators.place import place_mistype_stage, place_not_in_area_stage
from osm_addr_bot_spark.operators.streets import street_names_stage
from tests.helpers import elements_df, issues_df, mk_issue, offset

LAT, LON = 52.1, 21.1
ADDR = {"addr:city": "Warszawa", "addr:housenumber": "7", "addr:street": "Polna"}


def _poly_ring(clat, clon, radius_m, n=16):
    return [
        {
            "lat": clat + radius_m * math.sin(2 * math.pi * i / n) / 111_194.9,
            "lon": clon + radius_m * math.cos(2 * math.pi * i / n) / (111_194.9 * math.cos(math.radians(clat))),
        }
        for i in range(n)
    ]


def _polygons(spark, rows):
    return spark.createDataFrame(
        rows,
        "polygon_id long, name string, alt_name string, admin_level string,"
        " ring array<struct<lat:double, lon:double>>",
    )


# ------------------------------------------------------------------------ J1
def test_duplicates_positive_and_negative_distance(spark):
    la2, lo2 = offset(LAT, LON, east_m=90)     # within 100 m
    la3, lo3 = offset(LAT, LON, north_m=115)   # outside
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     element_type="node", tags=dict(ADDR, building="yes"), lat=LAT, lon=LON)
    near = mk_issue(changeset_id=2, element_id=2, element_type="way",
                    tags=dict(ADDR, name="Dom"), lat=la2, lon=lo2, timestamp=1_600_000_000)
    far_ = mk_issue(changeset_id=3, element_id=3, element_type="way",
                    tags=dict(ADDR), lat=la3, lon=lo3)
    issues = issues_df(spark, [issue])
    elements = elements_df(spark, [issue, near, far_])
    out = duplicates_stage(issues, elements).collect()
    got = {(r["uid"], r["changeset_id"], r["timestamp"]) for r in out}
    # issue survives + duplicate inherits issue's changeset/timestamp (Q4)
    assert got == {(-1, 1, 1_700_000_000), (2 + (1 << 27), 1, 1_700_000_000)}
    dup = [r for r in out if r["uid"] != -1][0]
    assert dup["bb_width_m"] == 0.0 and dup["minlat"] == 0.0  # zeroed bbox (Q4)


def test_duplicates_issue_and_duplicate_first_in_wins(spark):
    """An element that is both a surviving issue and another issue's
    duplicate keeps its OWN provenance: the reference builds set(issues)
    first, then .update(duplicates) — first-in wins (overpass.py:239-272).
    The inherited dup row here carries a SMALLER changeset id, so a
    min-(changeset, timestamp) winner would wrongly prefer it."""
    la2, lo2 = offset(LAT, LON, east_m=80)
    a = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                 element_type="node", tags=dict(ADDR, building="yes"),
                 lat=LAT, lon=LON, timestamp=1_700_000_100)
    b = mk_issue(check_id="DUPLICATED", changeset_id=2, element_id=2,
                 element_type="way", tags=dict(ADDR, name="Dom"),
                 lat=la2, lon=lo2, timestamp=1_700_000_200)
    out = duplicates_stage(issues_df(spark, [a, b]), elements_df(spark, [a, b])).collect()
    got = {(r["uid"], r["changeset_id"], r["timestamp"]) for r in out}
    assert got == {(-1, 1, 1_700_000_100), (2 + (1 << 27), 2, 1_700_000_200)}


def test_duplicates_no_match_drops_issue(spark):
    la3, lo3 = offset(LAT, LON, north_m=115)
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     tags=dict(ADDR), lat=LAT, lon=LON)
    far_ = mk_issue(changeset_id=3, element_id=3, element_type="way", tags=dict(ADDR),
                    lat=la3, lon=lo3)
    out = duplicates_stage(issues_df(spark, [issue]), elements_df(spark, [issue, far_]))
    assert out.count() == 0


def test_duplicates_null_safe_unit_and_whitelist(spark):
    la2, lo2 = offset(LAT, LON, east_m=80)
    base = dict(ADDR)
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     tags=base, lat=LAT, lon=LON)
    # differing addr:unit -> not equal (X9 null-safe)
    unit = mk_issue(changeset_id=2, element_id=2, element_type="way",
                    tags=dict(base, **{"addr:unit": "B"}), lat=la2, lon=lo2)
    # non-whitelisted key on the neighbor -> excluded (F21)
    dirty = mk_issue(changeset_id=2, element_id=3, element_type="way",
                     tags=dict(base, shop="bakery"), lat=la2, lon=lo2)
    out = duplicates_stage(issues_df(spark, [issue]), elements_df(spark, [issue, unit, dirty]))
    assert out.count() == 0

    # both units absent -> equal; whitelisted extras ok
    clean = mk_issue(changeset_id=2, element_id=4, element_type="way",
                     tags=dict(base, building="yes", name="X", source="s"), lat=la2, lon=lo2)
    out2 = duplicates_stage(issues_df(spark, [issue]), elements_df(spark, [issue, clean]))
    assert {r["uid"] for r in out2.collect()} == {-1, 4 + (1 << 27)}


def test_duplicates_same_family_not_matched(spark):
    # node issue only searches ways/relations (reference overpass.py:103-104)
    la2, lo2 = offset(LAT, LON, east_m=50)
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     element_type="node", tags=dict(ADDR), lat=LAT, lon=LON)
    node2 = mk_issue(changeset_id=2, element_id=2, element_type="node",
                     tags=dict(ADDR), lat=la2, lon=lo2)
    out = duplicates_stage(issues_df(spark, [issue]), elements_df(spark, [issue, node2]))
    assert out.count() == 0


def test_duplicates_skip_large(spark):
    la2, lo2 = offset(LAT, LON, east_m=50)
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     element_type="way", tags=dict(ADDR), lat=LAT, lon=LON, bb_m=1500)
    cand = mk_issue(changeset_id=2, element_id=2, element_type="node",
                    tags=dict(ADDR), lat=la2, lon=lo2)
    out = duplicates_stage(issues_df(spark, [issue]), elements_df(spark, [issue, cand]))
    assert out.count() == 0  # large issue never enters the stage


# ------------------------------------------------------------------------ J2
def test_place_not_in_area(spark):
    polys = _polygons(
        spark,
        [
            (1, "Wola", None, None, _poly_ring(LAT, LON, 3000)),
            (2, "AdminTown", None, "8", _poly_ring(LAT, LON, 3000)),
        ],
    )
    pn_lat, pn_lon = offset(LAT, LON, east_m=9000)
    far_lat, far_lon = offset(LAT, LON, east_m=11000)
    place_nodes = spark.createDataFrame(
        [(1, "NearVillage", pn_lat, pn_lon), (2, "FarVillage", far_lat, far_lon)],
        "node_id long, name string, lat double, lon double",
    )

    def bcwp(eid, place):
        return mk_issue(check_id="BAD_CITY_WITH_PLACE", priority=50, post_stage="place_not_in_area",
                        changeset_id=1, element_id=eid,
                        tags={"addr:city": "X", "addr:place": place}, lat=LAT, lon=LON)

    issues = issues_df(
        spark,
        [
            bcwp(1, "Wola"),         # inside matching polygon -> exonerated
            bcwp(2, "AdminTown"),    # admin polygon must NOT exonerate
            bcwp(3, "NearVillage"),  # 9 km place node -> exonerated
            bcwp(4, "FarVillage"),   # 11 km -> flagged
            bcwp(5, "Nowhere"),      # no match -> flagged
        ],
    )
    out = place_not_in_area_stage(issues, polys, place_nodes)
    assert {r["element_id"] for r in out.collect()} == {2, 4, 5}


def test_place_not_in_area_outside_polygon(spark):
    polys = _polygons(spark, [(1, "Wola", None, None, _poly_ring(LAT, LON, 1000))])
    out_lat, out_lon = offset(LAT, LON, north_m=1500)  # outside the ring
    place_nodes = spark.createDataFrame([], "node_id long, name string, lat double, lon double")
    issue = mk_issue(check_id="BAD_CITY_WITH_PLACE", changeset_id=1, element_id=1,
                     tags={"addr:city": "X", "addr:place": "Wola"}, lat=out_lat, lon=out_lon)
    out = place_not_in_area_stage(issues_df(spark, [issue]), polys, place_nodes)
    assert out.count() == 1  # not contained -> stays flagged


# ------------------------------------------------------------------------ J3
def test_place_mistype(spark):
    polys = _polygons(
        spark,
        [
            (1, "Zielona Góra", None, None, _poly_ring(LAT, LON, 3000)),
            (2, None, "Altville", None, _poly_ring(LAT, LON, 3000)),
        ],
    )

    def pm(eid, place, lat=LAT, lon=LON):
        return mk_issue(check_id="PLACE_MISTYPE", priority=80, post_stage="place_mistype",
                        changeset_id=1, element_id=eid, tags={"addr:place": place},
                        lat=lat, lon=lon)

    far_lat, far_lon = offset(LAT, LON, north_m=5000)
    issues = issues_df(
        spark,
        [
            pm(1, "zielona góra"),      # normalized match, exact miss -> flag
            pm(2, "Zielona Góra"),      # exact match -> clear
            pm(3, "Radom"),             # no match at all -> clear
            pm(4, "zielona góra", far_lat, far_lon),  # outside polygon -> clear
        ],
    )
    out = place_mistype_stage(issues, polys)
    assert {r["element_id"] for r in out.collect()} == {1}


def test_place_mistype_alt_name_counts(spark):
    # alt_name participates in the name set (reference overpass.py:333-334)
    polys = _polygons(spark, [(1, "Main", "Stare Miasto", None, _poly_ring(LAT, LON, 3000))])
    issue = mk_issue(check_id="PLACE_MISTYPE", changeset_id=1, element_id=1,
                     tags={"addr:place": "stare  miasto"}, lat=LAT, lon=LON)
    out = place_mistype_stage(issues_df(spark, [issue]), polys)
    assert out.count() == 1


# ------------------------------------------------------------------------ J4
def _streets(spark, rows):
    return spark.createDataFrame(
        rows, "way_id long, name string, alt_name string, points array<struct<lat:double, lon:double>>"
    )


def _street_at(dist_m, name, alt=None, n_pts=5):
    pts = []
    for i in range(n_pts):
        la, lo = offset(LAT, LON, north_m=dist_m, east_m=i * 50.0)
        pts.append({"lat": la, "lon": lo})
    return (hash(name) % 10_000, name, alt, pts)


def _usn(eid, street):
    return mk_issue(check_id="UNKNOWN_STREET_NAME", priority=10, post_stage="street_names",
                    changeset_id=1, element_id=eid, tags={"addr:street": street},
                    lat=LAT, lon=LON)


def test_street_names_tiers(spark):
    streets = _streets(
        spark,
        [
            _street_at(400, "Polna"),
            _street_at(2500, "Leśna"),
            _street_at(400, "Krótka", alt="Aleja Krótka"),
            _street_at(400, "polna"),  # case differs — exact match only (Q3)
        ],
    )
    issues = issues_df(
        spark,
        [
            _usn(1, "Polna"),         # cleared tier 1
            _usn(2, "Leśna"),         # cleared tier 3
            _usn(3, "Aleja Krótka"),  # alt_name exact -> cleared
            _usn(4, "Ogrodowa"),      # nothing named that -> flagged
            _usn(5, "POLNA"),         # only case-variant nearby -> flagged (Q3)
        ],
    )
    out = street_names_stage(issues, streets)
    assert {r["element_id"] for r in out.collect()} == {4, 5}


def test_street_names_distance_bound(spark):
    streets = _streets(spark, [_street_at(3300, "Polna", n_pts=1)])  # beyond 3 km
    out = street_names_stage(issues_df(spark, [_usn(1, "Polna")]), streets)
    assert out.count() == 1


def test_street_names_skip_large(spark):
    streets = _streets(spark, [_street_at(100, "Polna")])
    big = mk_issue(check_id="UNKNOWN_STREET_NAME", post_stage="street_names", changeset_id=1,
                   element_id=9, element_type="way", tags={"addr:street": "Nieznana"},
                   lat=LAT, lon=LON, bb_m=1500)
    out = street_names_stage(issues_df(spark, [big]), streets)
    assert out.count() == 0


# ------------------------------------------------------------------------ J5
def _hist(spark, rows):
    return spark.createDataFrame(
        rows,
        "element_type string, element_id long, valid_from long, valid_to long,"
        " tags map<string,string>",
    )


def test_guilt_semantics(spark):
    ts = 1_700_000_000
    issues = issues_df(
        spark,
        [
            # cs 1: addr tag changed -> guilty
            mk_issue(changeset_id=1, element_id=1, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
            # cs 2: only 'note' changed -> not guilty for ADDRESS (addr:* selector)
            mk_issue(changeset_id=2, element_id=2, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad", "note": "new"}, timestamp=ts),
            # cs 3: element absent from history -> created -> guilty (Q6)
            mk_issue(changeset_id=3, element_id=3, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
            # cs 4: identical snapshot -> not guilty
            mk_issue(changeset_id=4, element_id=4, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
        ],
    )
    hist = _hist(
        spark,
        [
            ("node", 1, 0, ts, {"addr:postcode": "old"}),
            ("node", 2, 0, ts, {"addr:postcode": "bad", "note": "old"}),
            ("node", 4, 0, ts, {"addr:postcode": "bad"}),
        ],
    )
    g = {r["changeset_id"]: r["guilty"] for r in guilty_changesets(issues, hist).collect()}
    assert g == {1: True, 2: False, 3: True, 4: False}

    kept = filter_guilty(issues, hist)
    assert {r["changeset_id"] for r in kept.collect()} == {1, 3}


def test_guilt_changeset_level(spark):
    # one guilty element convicts the whole changeset (Q6 granularity)
    ts = 1_700_000_000
    issues = issues_df(
        spark,
        [
            mk_issue(changeset_id=1, element_id=1, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
            mk_issue(changeset_id=1, element_id=2, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad2"}, timestamp=ts),
        ],
    )
    hist = _hist(
        spark,
        [
            ("node", 1, 0, ts, {"addr:postcode": "bad"}),   # unchanged
            ("node", 2, 0, ts, {"addr:postcode": "old"}),   # changed -> guilty
        ],
    )
    kept = filter_guilty(issues, hist)
    assert kept.count() == 2


def test_duplicates_salting_preserves_results(spark):
    """Row-for-row equality between salted (hot cell forced) and
    unsalted plans — the skew mechanism must not change semantics."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = []
    # 60 addresses inside one res-9 cell (a 'hot' urban cell)
    for i in range(60):
        la, lo = offset(LAT, LON, north_m=float(rng.uniform(-60, 60)),
                        east_m=float(rng.uniform(-60, 60)))
        etype = "node" if i % 2 == 0 else "way"
        rows.append(
            mk_issue(check_id="DUPLICATED", changeset_id=100 + i, element_id=i + 1,
                     element_type=etype, tags=dict(ADDR, building="yes"), lat=la, lon=lo)
        )
    issues = issues_df(spark, [r for i, r in enumerate(rows) if i % 3 == 0])
    elements = elements_df(spark, rows)

    salted = duplicates_stage(issues, elements, salt_buckets=8, hot_cell_threshold=10)
    plain = duplicates_stage(issues, elements, salt_buckets=1, hot_cell_threshold=10**9)
    key = lambda r: (r["check_id"], r["changeset_id"], r["uid"], r["timestamp"])
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
    assert salted.count() > 0


def test_street_cascade_equals_single_join(spark):
    """cascade=True (reference-shaped tier loop) and the default single
    max-tier join must produce identical rows."""
    streets = _streets(
        spark,
        [_street_at(400, "Polna"), _street_at(2500, "Leśna"), _street_at(3300, "Ogrodowa", n_pts=1)],
    )
    issues = issues_df(
        spark, [_usn(1, "Polna"), _usn(2, "Leśna"), _usn(3, "Ogrodowa"), _usn(4, "Zmyślona")]
    )
    single = street_names_stage(issues, streets)
    casc = street_names_stage(issues, streets, cascade=True)
    key = lambda r: (r["check_id"], r["changeset_id"], r["uid"])
    assert sorted(map(key, single.collect())) == sorted(map(key, casc.collect()))


def test_spatial_plans_have_no_python(spark):
    """Scale guard: the spatial joins must stay whole-stage-codegen
    JVM-native — no row-at-a-time or Arrow Python eval in the plan
    (BENCH.md 'hot paths are native')."""
    issue = mk_issue(check_id="DUPLICATED", changeset_id=1, element_id=1,
                     tags=dict(ADDR), lat=LAT, lon=LON)
    cand = mk_issue(changeset_id=2, element_id=2, element_type="way",
                    tags=dict(ADDR), lat=LAT, lon=LON)
    plan = duplicates_stage(
        issues_df(spark, [issue]), elements_df(spark, [issue, cand])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_guilt_strategies_equivalent(spark):
    """J5 now routes through the shared as-of operator (VERDICT r3 #6):
    the union (sort-based scale path) and interval strategies must give
    identical guilt verdicts and identical surviving issue sets."""
    ts = 1_700_000_000
    issues = issues_df(
        spark,
        [
            mk_issue(changeset_id=1, element_id=1, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
            mk_issue(changeset_id=2, element_id=2, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad", "note": "new"}, timestamp=ts),
            mk_issue(changeset_id=3, element_id=3, check_id="BAD_POSTCODE_FORMAT",
                     tags={"addr:postcode": "bad"}, timestamp=ts),
        ],
    )
    hist = _hist(
        spark,
        [
            ("node", 1, 0, ts, {"addr:postcode": "old"}),
            ("node", 1, ts, ts + 50, {"addr:postcode": "mid"}),  # multi-version key
            ("node", 2, 0, ts, {"addr:postcode": "bad", "note": "old"}),
        ],
    )
    g_i = {r["changeset_id"]: r["guilty"]
           for r in guilty_changesets(issues, hist, strategy="interval").collect()}
    g_u = {r["changeset_id"]: r["guilty"]
           for r in guilty_changesets(issues, hist, strategy="union").collect()}
    assert g_i == g_u == {1: True, 2: False, 3: True}
    kept_i = {tuple(r) for r in filter_guilty(issues, hist, strategy="interval")
              .select("changeset_id", "element_id").collect()}
    kept_u = {tuple(r) for r in filter_guilty(issues, hist, strategy="union")
              .select("changeset_id", "element_id").collect()}
    assert kept_i == kept_u
