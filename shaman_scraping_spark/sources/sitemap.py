"""Sitemap ingestion (op 49) — robots `Sitemap:` directives →
urlset / sitemapindex documents → frontier seeds.

Spec (pinned; the sequential oracle mirrors it exactly):

* `Sitemap:` robots.txt lines are GROUP-INDEPENDENT (RFC 9309 §2.4 /
  sitemaps.org: the directive applies regardless of user-agent
  groups); value = everything to the next whitespace; a line whose
  first non-blank char is `#` is a comment.  Absolute http(s) URLs
  only — non-canonicalizable values are dropped.
* Sitemap bodies are UTF-8 (the sitemaps.org requirement), so both
  sides decode with a plain UTF-8 cast; `<loc>` values are extracted
  textually (whitespace-trimmed) — the documents are machine-written,
  so a regex over `<loc>…</loc>` is the pinned parse, tag case
  exact per the protocol.
* A body containing `<sitemapindex` is an INDEX: its locs name child
  sitemaps, expanded ONE level (nested indexes are ignored).
* Sitemap documents are fetched OUT-OF-BAND at host discovery, like
  robots.txt: no quota cost, never marked seen, never in `fetched`.
  Their listed URLs enter the frontier at the next wave with
  depth 0, parent = the sitemap document's canonical URL, subject to
  the normal scope filter, seen dedup and robots gate — which is how
  sitemap-only "orphan" pages become reachable at all.

Both regexes are valid Java AND Python patterns, so the engine's
Catalyst `regexp_extract_all` and the oracle's `re` use the SAME
string — parity by construction.
"""

from __future__ import annotations

import re

#: robots.txt `Sitemap:` directive (case-insensitive, line-anchored)
SITEMAP_DIRECTIVE_RX = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"
#: `<loc>` entries of a urlset / sitemapindex document
LOC_RX = r"(?is)<loc>\s*(.*?)\s*</loc>"
#: marker distinguishing an index from a leaf urlset
INDEX_MARKER = "<sitemapindex"

_directive = re.compile(SITEMAP_DIRECTIVE_RX)
_loc = re.compile(LOC_RX)


def sitemap_urls_of_robots(body: str | None) -> list[str]:
    """`Sitemap:` URLs declared in a robots.txt body — the oracle twin
    of the engine's Catalyst extraction, deliberately the SAME bare
    regex over the whole body: a full-line comment never matches (the
    line anchor sees `#` first) and a `#fragment` inside a captured
    URL is stripped by canonicalization on both sides."""
    if not body:
        return []
    return _directive.findall(body)


def sitemap_locs(body: str | None) -> list[str]:
    """`<loc>` values of a sitemap document body."""
    if not body:
        return []
    return _loc.findall(body)


def is_sitemap_index(body: str | None) -> bool:
    return bool(body) and INDEX_MARKER in body
