"""URL algebra — canonicalization, 64-bit keying, host extraction.

SURVEY.md §2B ops 8–10.  The reference keys its URL-seen set on a
canonical URL identity (Shaman.Types LazyUri lineage; checkout empty,
SURVEY.md §0); BASELINE.json pins the canonical form: lowercase
scheme+host, strip fragment, sort query params, xxhash64 keying.

Canonical spec (exact; the pure-Python twin and the native Catalyst
path MUST agree byte-for-byte — property-tested in tests/test_url.py):

  scheme   := lowercase(scheme)
  host     := lowercase(host)            (no userinfo in scope)
  port     := dropped when default (http:80, https:443), kept otherwise
  path     := as-is;  empty path → "/"
  query    := params split on '&', empty params dropped, remainder
              sorted lexicographically (bytewise), joined with '&';
              empty result → no '?'
  fragment := dropped
  percent-encoding: preserved as-is (no re-encoding)

The native path is pure Catalyst expressions (whole-stage codegen,
pushdown-friendly); no Python in the hot loop.  ``xxhash64`` is the
Spark built-in (seed 42).  Exact set operations join on
(url_hash, url_canon) — the hash for shuffle locality, the string for
exactness (at a 10^10-URL frontier, 64-bit birthday collisions are
~10^3 rows; string equality keeps "fetch once per URL" exact).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# URLs containing raw whitespace are invalid (RFC 3986 forbids them;
# Spark's parse_url/Java URI rejects them) — the twin mirrors that.
# extract_links strips leading/trailing whitespace before resolution,
# so only genuinely-malformed hrefs are dropped.
_URL_WS_RE = re.compile(r"\s")


# --- pure-Python twin (oracle simulator + property tests) -------------------

def canonicalize_url_py(url: str) -> str | None:
    """Pure-Python canonicalizer; must agree with :func:`canonicalize_url`."""
    if url is None or _URL_WS_RE.search(url):
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    if ":" in host:  # IPv6 literal — authority keeps the brackets
        host = f"[{host}]"
    port = ""
    try:
        if parts.port is not None:
            port = str(parts.port)
    except ValueError:  # out-of-range port (>65535) → invalid URL
        return None
    if port == _DEFAULT_PORTS.get(scheme):
        port = ""
    path = parts.path or "/"
    params = [p for p in parts.query.split("&") if p != ""]
    query = "&".join(sorted(params))
    out = f"{scheme}://{host}"
    if port:
        out += f":{port}"
    out += path
    if query:
        out += f"?{query}"
    return out


def url_host_py(url: str) -> str | None:
    c = canonicalize_url_py(url)
    if c is None:
        return None
    try:
        host = urlsplit(c).hostname
    except ValueError:  # pragma: no cover
        return None
    if host and ":" in host:  # IPv6 — match the native HOST part
        return f"[{host}]"
    return host


# --- native Catalyst path ---------------------------------------------------

def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a Catalyst expression (see spec above).

    Returns NULL for non-http(s)/unparseable URLs so a ``.filter
    (col.isNotNull())`` drops them — mirrors the reference refusing to
    enqueue non-web schemes.
    """
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(url, F.lit("QUERY"))

    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    path_part = F.when(path == "", F.lit("/")).otherwise(path)

    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    query_part = F.when(
        query.isNotNull() & (sorted_q != ""), F.concat(F.lit("?"), sorted_q)
    ).otherwise(F.lit(""))

    canon = F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)
    port_ok = (port == "") | (port.try_cast("bigint") <= F.lit(65535))
    ok = (
        scheme.isin("http", "https")
        & host.isNotNull()
        & (host != "")
        & port_ok
    )
    return F.when(ok, canon).otherwise(F.lit(None))


def url_host(url_canon: Column) -> Column:
    """Host of an already-canonical URL (cheap: no lowercasing needed)."""
    return F.parse_url(url_canon, F.lit("HOST"))


def url_hash(url_canon: Column) -> Column:
    """64-bit xxhash64 key of the canonical URL (Spark built-in, seed 42)."""
    return F.xxhash64(url_canon)


def url_template(url_canon: Column) -> Column:
    """URL-pattern template of a canonical URL (op 54, spec in
    config.py): path+query with every ASCII digit run collapsed to
    ``#`` — ``/p/17?id=17`` and ``/p/90210?id=90210`` share
    ``/p/#?id=#``.  Pure Catalyst (whole-stage codegen); the Python
    twin is :func:`url_template_of`.

    Path extraction = everything from the first ``/`` after the first
    ``://`` (identical to the politeness path expression: canonical
    URLs always have a path, and a ``://`` inside the query must not
    re-anchor the scan)."""
    # rest of the URL after "scheme://" (1-based substr; len(scheme)+4
    # = first char after the 3-char separator)
    rest = url_canon.substr(
        F.length(F.split_part(url_canon, F.lit("://"), F.lit(1)))
        + F.lit(4),
        F.length(url_canon),
    )
    path = rest.substr(F.instr(rest, "/"), F.length(rest))
    return F.regexp_replace(path, "[0-9]+", "#")


def url_template_of(url_canon: str) -> str:
    """Python twin of :func:`url_template` — byte-identical on
    canonical URLs (property-tested)."""
    rest = url_canon.split("://", 1)[1]
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    return re.sub(r"[0-9]+", "#", path)


def with_url_columns(df, url_col: str = "url"):
    """Stamp (url_canon, url_hash, host) onto *df* and drop non-web rows.

    The standard prologue of every wave: pure Catalyst, pipelines into
    the scan (no shuffle, no Python).
    """
    return (
        df.withColumn("url_canon", canonicalize_url(F.col(url_col)))
        .filter(F.col("url_canon").isNotNull())
        .withColumn("url_hash", url_hash(F.col("url_canon")))
        .withColumn("host", url_host(F.col("url_canon")))
    )


# --- SURT keys (CDX indexing) ------------------------------------------------

def surt_key(url_canon: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a CANONICAL
    url: host labels reversed and comma-joined, then ')' + path?query —
    `com,example)/a?q=1`.  Grouping every subdomain/path under a common
    prefix makes a lexicographically sorted index range-scannable per
    site — the layout CDX archive indexes sort by.  Pure Catalyst
    (regexp + split/reverse/join), codegen'd."""
    authority = F.regexp_extract(url_canon, r"^[a-z]+://([^/]*)", 1)
    rest = F.regexp_extract(url_canon, r"^[a-z]+://[^/]*(/.*)$", 1)
    rev = F.array_join(F.reverse(F.split(authority, r"\.")), ",")
    return F.concat(
        rev, F.lit(")"),
        F.when(rest == "", F.lit("/")).otherwise(rest),
    )


def surt_key_py(url_canon: str) -> str:
    """Python twin of :func:`surt_key` — byte-identical on canonical
    URLs (property-tested)."""
    scheme_rest = url_canon.split("://", 1)[1]
    slash = scheme_rest.find("/")
    authority = scheme_rest[:slash] if slash >= 0 else scheme_rest
    rest = scheme_rest[slash:] if slash >= 0 else "/"
    return ",".join(reversed(authority.split("."))) + ")" + rest
