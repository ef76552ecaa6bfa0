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
* a query emptied by the filter drops its ``?``;
* userinfo (``user:pw@``) is DROPPED — the canonical form is a dedup/
  quota key, and credentials must never leak into corpus accounting
  tables.  (:func:`resolve_url` by contrast keeps the base authority
  verbatim: resolution is faithful, canonicalization is lossy.)
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


# ---------------------------------------------------------------------------
# RFC 3986 §5 reference resolution — still pure Column expressions
# ---------------------------------------------------------------------------

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
_HIER_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 as a fold over the segment array: ``.`` drops,
    ``..`` pops (never past the root), anything else pushes.  A
    trailing ``.``/``..`` leaves the directory's trailing slash, per
    the RFC's output examples (``/a/b/..`` → ``/a/``).  All paths
    reaching here are absolute (the resolver builds them that way)."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..",
                  F.when(F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1))
                  .otherwise(acc))
            .otherwise(F.concat(acc, F.array(s)))  # "" segments kept: //
        ),
    )
    # a trailing "." / ".." leaves the directory slash; plain segments
    # (incl. "") already carry their own
    last = F.element_at(segs, -1)
    folded = F.when(
        (last == ".") | (last == ".."),
        F.concat(folded, F.array(F.lit(""))),
    ).otherwise(folded)
    out = F.array_join(folded, "/")
    return F.when((out == "") | (out == "/"), F.lit("/")).otherwise(out)


def resolve_url(base: Column, ref: Column) -> Column:
    """Absolute URL of reference ``ref`` against absolute ``base``
    (RFC 3986 §5.2), as pure Catalyst expressions — zero Python in the
    plan, the crawl-frontier/link-graph building block.

    Contract (pinned by tests against ``urllib.parse.urljoin``):

    * fragments are DROPPED from the result (frontier semantics — the
      canonicalizer drops them anyway);
    * ``ref`` with its own scheme wins outright; non-hierarchical
      results (``mailto:``, ``javascript:``, ``data:``) pass through
      untouched;
    * ``//host/p`` inherits the base scheme; ``/p`` the base
      authority; ``?q`` the base path; empty/fragment-only refs keep
      the base path AND query;
    * relative paths merge against the base directory and dot-segments
      are removed (§5.2.4);
    * the scheme is lowercased; host case is left to
      :func:`normalize_url`.
    """
    ref2 = F.substring_index(ref, "#", 1)  # strip ref fragment first
    proto = F.lower(_part(base, "PROTOCOL"))
    auth = _part(base, "AUTHORITY")
    bpath = F.coalesce(_part(base, "PATH"), F.lit(""))
    bquery = _part(base, "QUERY")
    base_no_frag = F.concat(
        proto, F.lit("://"), auth, bpath,
        F.when(bquery.isNull() | (bquery == ""), F.lit("")).otherwise(
            F.concat(F.lit("?"), bquery)))
    # base directory: up to and including the last "/", or "/" itself
    bdir = F.when(bpath.contains("/"),
                  F.regexp_replace(bpath, r"[^/]*$", "")).otherwise(F.lit("/"))
    candidate = (
        F.when(ref2.rlike(_SCHEME_RE), ref2)
        .when(ref2.startswith("//"), F.concat(proto, F.lit(":"), ref2))
        .when(ref2.startswith("/"), F.concat(proto, F.lit("://"), auth, ref2))
        .otherwise(F.concat(proto, F.lit("://"), auth, bdir, ref2))
    )
    # cleanup of the candidate: re-split and remove dot segments.
    # RFC 3986 §5.2.2 applies remove_dot_segments to every branch with
    # a ref PATH; empty and query-only refs instead copy the base path
    # VERBATIM (the base is presumed already resolved), handled below.
    cproto = F.lower(_part(candidate, "PROTOCOL"))
    cauth = _part(candidate, "AUTHORITY")
    cpath = F.coalesce(_part(candidate, "PATH"), F.lit(""))
    cquery = _part(candidate, "QUERY")
    # an empty path stays empty (resolving against a pathless base
    # yields a pathless URL — the '/' is normalize_url's job)
    rebuilt = F.concat(
        cproto, F.lit("://"), cauth,
        F.when(cpath == "", F.lit("")).otherwise(_remove_dot_segments(cpath)),
        F.when(cquery.isNull() | (cquery == ""), F.lit("")).otherwise(
            F.concat(F.lit("?"), cquery)))
    return (
        F.when(ref2 == "", base_no_frag)
        .when(ref2.startswith("?"),
              F.concat(proto, F.lit("://"), auth, bpath, ref2))
        .otherwise(F.when(candidate.rlike(_HIER_RE), rebuilt)
                   .otherwise(candidate))
    )
