"""URL canonicalization + domain analysis — pure JVM-side columns.

Web-pipeline staple the reference (an HTML kernel) stops short of:
URL-level dedup and per-domain corpus accounting both need a stable
canonical URL key first.  Everything here is built from
``parse_url``/``lower``/``filter``/``array_join`` Column expressions —
no Python UDFs, fully inside whole-stage codegen, map-only (the only
shuffle is whatever aggregation the caller adds on top).

Canonicalization contract (pinned by tests/test_urls.py):

* scheme and host lowercase;
* default ports stripped (``http:80``, ``https:443``); other explicit
  ports kept;
* empty path → ``/``;
* fragment dropped;
* tracking params dropped: any ``utm_*`` plus the exact names in
  :data:`TRACKING_EXACT`; remaining params keep their original order
  (no resort — ``?b=1&a=2`` is left alone, reordering is a semantic
  change some endpoints notice);
* a query emptied by the filter drops its ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid")

# one anchored pattern per dropped param: utm_* or an exact name,
# matched against "name=value" or a bare "name"
_TRACKING_RE = "^(utm_[^=&]*|" + "|".join(TRACKING_EXACT) + ")(=|$)"


def _part(url: Column, key: str) -> Column:
    return F.parse_url(url, F.lit(key))


def host_of(url: Column) -> Column:
    """Lowercased host (no port, no userinfo)."""
    return F.lower(_part(url, "HOST"))


def registered_domain(host: Column) -> Column:
    """Last two labels of the host (``a.b.example.com`` →
    ``example.com``).  A public-suffix list would be needed for ccTLD
    correctness (``example.co.uk``) — documented simplification."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract."""
    proto = F.lower(_part(url, "PROTOCOL"))
    host = host_of(url)
    authority = F.lower(_part(url, "AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443"))
    host_port = F.when(port == "", host).when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port))
    path = _part(url, "PATH")
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.coalesce(_part(url, "QUERY"), F.lit(""))
    kept = F.filter(F.split(query, "&"),
                    lambda p: (p != "") & ~p.rlike(_TRACKING_RE))
    query_norm = F.array_join(kept, "&")
    return F.concat(
        proto, F.lit("://"), host_port, path,
        F.when(query_norm == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_norm)),
    )


def with_url_columns(df, url_col: str = "url"):
    """Attach ``url_norm``, ``host``, ``domain`` — the standard triple
    for URL-level dedup (groupBy url_norm) and per-domain quota
    sampling (groupBy domain)."""
    u = F.col(url_col)
    return (df.withColumn("url_norm", normalize_url(u))
              .withColumn("host", host_of(u))
              .withColumn("domain", registered_domain(host_of(u))))
