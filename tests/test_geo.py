"""Geo kernels (stages/geo.py) + city-level GeoIP enrichment.

The driver-gated geo aggregation entries are covered by
test_queries_oracle; these tests pin the kernels themselves:
- the vectorized geohash equals the classic bit-by-bit algorithm;
- the SQL generator reproduces the kernel bit-for-bit in DuckDB;
- haversine matches a pure-``math`` scalar reference (the real ES
  ``arc`` metric that can swap into the ring kernel);
- the enrichment actor emits the location struct and drops private IPs
  (reference core/geoip.py:117-124, :101-106).
"""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.stages.geo import (GEOHASH_BASE32, geohash_cells,
                                          geohash_sql, haversine_km,
                                          plane_dist2_cd)
from logsentinelai_ray.stages.geoip import GeoIPEnrich, _fake_city_lookup


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic interval-halving geohash (public algorithm), bit by bit."""
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        rng, v = (lon_r, lon) if even else (lat_r, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            ch = ch * 2 + 1
            rng[0] = mid
        else:
            ch = ch * 2
            rng[1] = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH_BASE32[ch])
            bit, ch = 0, 0
    return "".join(out)


@pytest.fixture(scope="module")
def grid_points():
    rng = np.random.default_rng(42)
    lat_cd = rng.integers(-8500, 8500, 2000)
    lon_cd = rng.integers(-18000, 18000, 2000)
    return lat_cd, lon_cd


@pytest.mark.parametrize("precision", [3, 4, 5])
def test_geohash_matches_classic_algorithm(grid_points, precision):
    lat_cd, lon_cd = grid_points
    mine = geohash_cells(lat_cd, lon_cd, precision)
    ref = [_ref_geohash(a / 100.0, b / 100.0, precision)
           for a, b in zip(lat_cd[:300].tolist(), lon_cd[:300].tolist())]
    assert list(mine[:300]) == ref


@pytest.mark.parametrize("precision", [3, 4])
def test_geohash_sql_parity(grid_points, precision):
    lat_cd, lon_cd = grid_points
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lat_cd BIGINT, lon_cd BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)",
                    list(zip(lat_cd.tolist(), lon_cd.tolist())))
    cl, ct, code, chars = geohash_sql(precision)
    got = [r[0] for r in con.execute(f"""
        WITH c AS (SELECT {cl} AS cl, {ct} AS ct FROM pts),
             k AS (SELECT {code} AS code FROM c)
        SELECT {chars} FROM k""").fetchall()]
    assert got == list(geohash_cells(lat_cd, lon_cd, precision))


def test_haversine_matches_math_reference(grid_points):
    lat_cd, lon_cd = grid_points
    lat = lat_cd[:100] / 100.0
    lon = lon_cd[:100] / 100.0
    got = haversine_km(lat, lon, 50.11, 8.64)

    def ref(la, lo):
        la1, lo1, la2, lo2 = map(math.radians, (la, lo, 50.11, 8.64))
        a = (math.sin((la2 - la1) / 2) ** 2
             + math.cos(la1) * math.cos(la2)
             * math.sin((lo2 - lo1) / 2) ** 2)
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    exp = np.array([ref(a, b) for a, b in zip(lat.tolist(), lon.tolist())])
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # sanity: antipodal-ish points approach half the circumference
    assert haversine_km(np.array([0.0]), np.array([180.0]), 0.0, 0.0)[0] \
        == pytest.approx(math.pi * 6371.0, rel=1e-9)


def test_haversine_ring_variant_agrees_with_plane_on_ordering(grid_points):
    """The exact-integer ring metric and true haversine agree on relative
    ordering for points well inside a hemisphere around the origin —
    the documented seam: swapping haversine into the ring kernel changes
    distances, not the exchange shape."""
    lat_cd, lon_cd = grid_points
    olat, olon = 5011, 864
    near = (np.abs(lat_cd - olat) < 4000) & (np.abs(lon_cd - olon) < 4000) \
        & (np.abs(lat_cd) < 6000)
    lat_n, lon_n = lat_cd[near][:50], lon_cd[near][:50]
    d2 = plane_dist2_cd(lat_n, lon_n, olat, olon)
    km = haversine_km(lat_n / 100.0, lon_n / 100.0,
                      olat / 100.0, olon / 100.0)
    # monotone-ish: the closest-by-plane point is among the 25% closest
    # by haversine (loose — lon compression grows with |lat|)
    order_p = np.argsort(d2, kind="stable")
    order_h = np.argsort(km, kind="stable")
    assert order_p[0] in order_h[:max(1, len(order_h) // 4)]


def test_city_lookup_deterministic_and_bounded():
    cc, lat_cd, lon_cd = _fake_city_lookup("52.10.20.30")
    assert cc in {"US", "DE", "KR", "JP", "BR", "IN", "FR", "GB"}
    assert -9000 <= lat_cd < 9000 and -18000 <= lon_cd < 18000
    assert _fake_city_lookup("52.10.20.30") == (cc, lat_cd, lon_cd)


def test_enrich_with_location_struct_and_private_drop():
    enrich = GeoIPEnrich(text_col="line", with_location=True)
    batch = pa.table({"line": [
        "src=52.1.2.3 peer=10.0.0.1",      # public + private
        "src=192.168.1.1 peer=127.0.0.1",  # all private
        "no ips here",
    ]})
    out = enrich(batch)
    typ = out.schema.field("geo_ips").type
    names = [typ.value_type.field(i).name
             for i in range(typ.value_type.num_fields)]
    assert names == ["ip", "country_code", "lat_cd", "lon_cd"]
    rows = out["geo_ips"].to_pylist()
    assert [len(r) for r in rows] == [1, 0, 0]
    hit = rows[0][0]
    assert hit["ip"] == "52.1.2.3"
    assert (hit["country_code"], hit["lat_cd"], hit["lon_cd"]) \
        == _fake_city_lookup("52.1.2.3")
