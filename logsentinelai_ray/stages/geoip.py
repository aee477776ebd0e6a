"""IP extraction/classification + GeoIP-style enrichment (M11 / J1).

The reference enriches every IP in its analysis docs against a local
MaxMind mmdb held in a cached singleton (reference core/geoip.py:21-59
loads once, :81-89 LRU-caches lookups, :154-242 walks the doc and rewrites
``source_ips``), dropping private/invalid IPs (core/geoip.py:73-79,
101-106). Our corpus embeds IPs inside log-like content lines; the same
semantics become:

- ``add_ip_stats``: vectorized extraction (RE2) + private/public
  classification per document — exact, SQL-replicable counts.
- ``GeoIPEnrich``: the stateful broadcast-lookup-join pattern — an actor
  pool whose __init__ receives a ``ray.put`` handle to the lookup table
  (broadcast once, never re-shipped per batch) and keeps an LRU cache like
  the reference's. The real mmdb isn't in this container, so the DB is a
  deterministic synthetic map (clearly marked); swapping in maxminddb
  means replacing ``_fake_geo_db`` only.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

IP_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_COUNTRIES = ["US", "DE", "KR", "JP", "BR", "IN", "FR", "GB"]


def is_private_ip(ip: str) -> bool:
    """The reference's predicate (core/geoip.py:101-106): private OR
    loopback OR link-local; invalid strings count as not-enrichable."""
    try:
        addr = ipaddress.ip_address(ip)
    except ValueError:
        return True
    return addr.is_private or addr.is_loopback or addr.is_link_local


def add_ip_stats(batch: pa.Table, text_col: str = "content") -> pa.Table:
    """Per-row counts of embedded IPv4 literals, split private/public.

    Private test here is the SQL-replicable RFC1918 + loopback + link-local
    prefix form (10/8, 172.16/12, 192.168/16, 127/8, 169.254/16) applied to
    syntactically valid dotted quads.
    """
    text = pc.fill_null(batch[text_col], "")
    # count is a vectorized RE2 kernel; pyarrow has no findall kernel, so
    # classification walks the (few) matches per row in Python
    n_ips = pc.count_substring_regex(text, IP_PATTERN) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    import re

    rex = re.compile(IP_PATTERN)
    priv = np.zeros(batch.num_rows, dtype=np.int64)
    pub = np.zeros(batch.num_rows, dtype=np.int64)
    # the Python walk touches ONLY rows the vectorized count says have a
    # match — zero-match rows (the common case) never materialize
    hot = np.flatnonzero(n_ips > 0)
    hot_texts = pc.take(text, pa.array(hot, pa.int64())).to_pylist()
    for i, t in zip(hot, hot_texts):
        if not t:
            continue
        for m in rex.findall(t):
            parts = [int(x) for x in m.split(".")]
            if any(p > 255 for p in parts):
                continue
            a, b2 = parts[0], parts[1]
            is_priv = (a == 10 or (a == 172 and 16 <= b2 <= 31)
                       or (a == 192 and b2 == 168) or a == 127
                       or (a == 169 and b2 == 254))
            if is_priv:
                priv[i] += 1
            else:
                pub[i] += 1
    return (batch
            .append_column("n_ips", pa.array(n_ips))
            .append_column("n_private_ips", pa.array(priv))
            .append_column("n_public_ips", pa.array(pub)))


def _fake_geo_db() -> dict[str, str]:
    """DETERMINISTIC STAND-IN for the mmdb: /24 prefix → country code.
    (The real GeoLite2 DB is not available in this environment; the
    enrichment plumbing — broadcast, actor cache, schema — is real.)"""
    return {}  # lookups are computed on demand from the prefix hash


def _fake_lookup(ip: str) -> str:
    """Prefix (/24) → country code. SQL-replicable octet arithmetic so the
    whole enrichment has an exact DuckDB oracle (a real mmdb lookup would
    be the swap-in here)."""
    o1, o2, o3 = (int(x) for x in ip.split(".")[:3])
    return _COUNTRIES[(o1 * 7 + o2 * 13 + o3 * 31) % len(_COUNTRIES)]


def _fake_city_lookup(ip: str) -> tuple[str, int, int]:
    """City-level stand-in: ``(country_code, lat_cd, lon_cd)`` with the
    coordinates in INTEGER CENTI-DEGREES, mirroring the reference's
    ``location: {lat, lon}`` geo_point payload (core/geoip.py:117-124)
    while staying exact-integer so geo aggregations have bit-exact SQL
    oracles. Swapping in geoip2's ``reader.city(ip).location`` is the
    same seam as ``mmdb_lookup_factory``."""
    o1, o2, o3, o4 = (int(x) for x in ip.split("."))
    lat_cd = (o1 * 131 + o2 * 17 + o3 * 3 + o4) % 17000 - 8500
    lon_cd = (o1 * 31 + o2 * 101 + o3 * 7 + o4 * 11) % 36000 - 18000
    return _fake_lookup(ip), lat_cd, lon_cd


def mmdb_lookup_factory(mmdb_path: str):
    """Real-database lookup via maxminddb (OPTIONAL dependency — absent
    from this container, so the deterministic ``_fake_lookup`` stand-in
    is the default; reference core/geoip.py:21-59 loads the mmdb once,
    utils/geoip_downloader.py:36-135 fetches it). Pass the returned
    callable as ``GeoIPEnrich(lookup_fn=...)`` to swap the real DB in."""
    try:
        import maxminddb
    except ImportError as e:  # pragma: no cover - dep absent here
        raise ImportError(
            "maxminddb is not installed; GeoIPEnrich falls back to the "
            "documented synthetic lookup unless a lookup_fn is provided"
        ) from e
    reader = maxminddb.open_database(mmdb_path)

    def lookup(ip: str) -> str | None:
        rec = reader.get(ip) or {}
        return (rec.get("country") or {}).get("iso_code")

    return lookup


class GeoIPEnrich:
    """Actor-pool stage: extract public IPs per row, enrich each with a
    country code via the broadcast DB handle; private/invalid IPs are
    dropped exactly like the reference (core/geoip.py:183-216).

    ``lookup_fn`` overrides the per-IP country resolution (e.g.
    ``mmdb_lookup_factory(path)`` for a real GeoLite2 database)."""

    def __init__(self, db_ref=None, cache_size: int = 1000,
                 text_col: str = "content", lookup_fn=None,
                 with_location: bool = False, city_lookup_fn=None):
        import ray

        self.db = ray.get(db_ref) if db_ref is not None else _fake_geo_db()
        self.text_col = text_col
        self.lookup_fn = lookup_fn
        # with_location mirrors the reference's city lookup payload
        # (core/geoip.py:117-124: location {lat, lon} for Kibana
        # geo_point); city_lookup_fn is the real-geoip2 seam —
        # ip -> (country_code, lat_cd, lon_cd) or None
        self.with_location = with_location
        self.city_lookup_fn = city_lookup_fn or _fake_city_lookup
        self.cache: dict[str, str | None] = {}
        self.cache_size = cache_size  # reference GEOIP_CACHE_SIZE=1000

    def _lookup(self, ip: str) -> str | None:
        hit = self.cache.get(ip, "__miss__")
        if hit != "__miss__":
            return hit
        if is_private_ip(ip):
            val = None
        elif self.with_location:
            val = self.city_lookup_fn(ip)
        elif self.lookup_fn is not None:
            val = self.lookup_fn(ip)
        else:
            val = self.db.get(".".join(ip.split(".")[:3])) \
                or _fake_lookup(ip)
        if len(self.cache) >= self.cache_size:
            self.cache.clear()
        self.cache[ip] = val
        return val

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        # vectorized pre-pass: pyarrow lacks a findall kernel, so the
        # per-row Python walk is unavoidable — but only for rows that the
        # RE2 count kernel says actually contain an IP-shaped substring
        text = pc.fill_null(batch[self.text_col], "")
        counts = pc.count_substring_regex(text, IP_PATTERN) \
            .to_numpy(zero_copy_only=False)
        rex = re.compile(IP_PATTERN)
        ips_out = [[] for _ in range(batch.num_rows)]
        for i in np.flatnonzero(counts > 0):
            pairs = []
            for ip in dict.fromkeys(rex.findall(text[int(i)].as_py())):
                hit = self._lookup(ip)
                if hit is None:
                    continue
                if self.with_location:
                    cc, lat_cd, lon_cd = hit
                    pairs.append({"ip": ip, "country_code": cc,
                                  "lat_cd": lat_cd, "lon_cd": lon_cd})
                else:
                    pairs.append({"ip": ip, "country_code": hit})
            ips_out[int(i)] = pairs
        fields = [("ip", pa.string()), ("country_code", pa.string())]
        if self.with_location:
            fields += [("lat_cd", pa.int64()), ("lon_cd", pa.int64())]
        typ = pa.list_(pa.struct(fields))
        return batch.append_column("geo_ips", pa.array(ips_out, typ))
