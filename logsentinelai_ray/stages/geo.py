"""Geo kernels for the GeoIP ``location`` field (reference parity).

The reference's city lookup emits ``location: {lat, lon}`` for every
enriched IP so Kibana can drive geo_point maps and geo aggregations
(reference core/geoip.py:117-124 builds the dict; the dashboard maps it).
This module provides the aggregation kernels over those coordinates:

- coordinates are carried as INTEGER CENTI-DEGREES (``lat_cd`` in
  [-9000, 9000), ``lon_cd`` in [-18000, 18000)) so every bucketing
  decision is exact integer arithmetic — reproducible bit-for-bit by a
  SQL oracle and invariant to batch/cluster topology;
- :func:`geohash_cells` is the TRUE base32 geohash (bit-interleaved,
  MSB-first, lon first — the ES ``geohash_grid`` cell id), vectorized
  over numpy arrays; :func:`geohash_sql` generates the equivalent
  unrolled DuckDB expression for the oracle;
- :func:`plane_dist2_cd` is the exact integer ring metric used by the
  ``geo_distance`` driver entry (squared equirectangular offset in
  centi-degrees). :func:`haversine_km` is the real ES ``arc`` metric —
  float trig, so it backs the unit-tested variant rather than the
  hash-compared oracle entry; swapping it into the ring kernel changes
  only the per-row distance computation, not the exchange shape.
"""

from __future__ import annotations

import numpy as np

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cells(lat_cd: np.ndarray, lon_cd: np.ndarray,
                  precision: int = 4) -> np.ndarray:
    """Vectorized true geohash from integer centi-degree coordinates.

    ``bits = 5 * precision``; longitude gets ``ceil(bits/2)`` bits,
    latitude ``floor(bits/2)``, interleaved lon-first from the MSB —
    the standard geohash bit layout. Cell indices are exact integer
    floor-divisions of the centi-degree grid, so the same cell id is
    computable in SQL (see :func:`geohash_sql`).
    """
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    cl = (np.asarray(lon_cd, dtype=np.int64) + 18000) * (1 << nlon) // 36000
    ct = (np.asarray(lat_cd, dtype=np.int64) + 9000) * (1 << nlat) // 18000
    code = np.zeros(len(cl), dtype=np.int64)
    for i in range(nlon):
        code |= ((cl >> (nlon - 1 - i)) & 1) << (bits - 1 - 2 * i)
    for i in range(nlat):
        code |= ((ct >> (nlat - 1 - i)) & 1) << (bits - 2 - 2 * i)
    alphabet = np.array(list(GEOHASH_BASE32))
    chars = np.empty((len(cl), precision), dtype="U1")
    for p in range(precision):
        chars[:, p] = alphabet[(code >> (bits - 5 * (p + 1))) & 31]
    # row-wise join; precision is tiny (<=12) so this is p column concats
    out = chars[:, 0].astype(object)
    for p in range(1, precision):
        out = out + chars[:, p]
    return out.astype(str)


def geohash_sql(precision: int,
                lat_expr: str = "lat_cd",
                lon_expr: str = "lon_cd") -> tuple[str, str, str, str]:
    """DuckDB fragments reproducing :func:`geohash_cells` exactly.

    Returns ``(cl, ct, code, chars)`` — the two cell-index expressions,
    the unrolled bit-interleave over columns named ``cl``/``ct``, and the
    base32 substring concat over a column named ``code`` — to be composed
    as chained CTEs by the oracle.
    """
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    cl = f"(({lon_expr}) + 18000) * {1 << nlon} // 36000"
    ct = f"(({lat_expr}) + 9000) * {1 << nlat} // 18000"
    terms = [f"(((cl >> {nlon - 1 - i}) & 1) << {bits - 1 - 2 * i})"
             for i in range(nlon)]
    terms += [f"(((ct >> {nlat - 1 - i}) & 1) << {bits - 2 - 2 * i})"
              for i in range(nlat)]
    code = " | ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_BASE32}', "
        f"1 + CAST((code >> {bits - 5 * (p + 1)}) & 31 AS INT), 1)"
        for p in range(precision))
    return cl, ct, code, chars


def plane_dist2_cd(lat_cd: np.ndarray, lon_cd: np.ndarray,
                   origin_lat_cd: int, origin_lon_cd: int) -> np.ndarray:
    """Exact integer squared equirectangular offset in centi-degrees."""
    dlat = np.asarray(lat_cd, dtype=np.int64) - int(origin_lat_cd)
    dlon = np.asarray(lon_cd, dtype=np.int64) - int(origin_lon_cd)
    return dlat * dlat + dlon * dlon


def haversine_km(lat: np.ndarray, lon: np.ndarray,
                 origin_lat: float, origin_lon: float) -> np.ndarray:
    """Great-circle distance (the ES ``geo_distance`` ``arc`` type),
    vectorized float64. Used by the unit-tested real-metric variant of
    the ring kernel (cross-checked against a pure-``math`` scalar
    reference); the oracle-hashed driver entry uses the exact integer
    metric instead because SQL/libm trig is not guaranteed bit-identical
    across engines."""
    r = 6371.0
    la1 = np.radians(np.asarray(lat, dtype=np.float64))
    lo1 = np.radians(np.asarray(lon, dtype=np.float64))
    la2 = np.radians(float(origin_lat))
    lo2 = np.radians(float(origin_lon))
    a = (np.sin((la2 - la1) / 2.0) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2.0) ** 2)
    return 2.0 * r * np.arcsin(np.sqrt(a))
