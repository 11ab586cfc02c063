"""HTML content processing: charset decode, text extraction, link
extraction, redirect targets.  SURVEY.md §2D ops 23–26.

The reference parses fetched HTML with a DOM library (Shaman.Dom /
HtmlAgilityPack lineage) and extracts ``a[href]`` links plus visible
text; the reference checkout is empty (SURVEY.md §0) so the behavioral
contract is the canonical extraction spec of FIXTURES.md §B.2, which
pins the per-row invariant of BASELINE.json (byte-identical ``text``
per ``url``).

All Spark entry points here are **scalar pandas UDFs** (Arrow-batched;
no per-row Python UDFs — BASELINE.json input_hint).  The pure-Python
kernels are module-level functions so pytest can property-test them
without a SparkSession.

Extraction spec (FIXTURES.md §B.2), implemented by ``extract_text``:
  html bytes
    → decode (meta-charset sniff, else utf-8 with replacement)
    → drop <script>/<style> subtrees and <!-- --> comments
    → strip all tags
    → decode the five XML default entities + &nbsp; (U+00A0)
    → collapse whitespace runs to a single space, strip ends
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

# --- charset sniffing -------------------------------------------------------

# <meta charset="..."> or <meta http-equiv=Content-Type content="...charset=...">
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)

_KNOWN_CHARSETS = {
    "utf-8", "utf8", "latin-1", "latin1", "iso-8859-1", "iso8859-1",
    "windows-1252", "cp1252", "ascii", "us-ascii",
}


def sniff_charset(html_bytes: bytes) -> str:
    """Charset from a <meta> tag in the first 1024 bytes, else utf-8."""
    if not html_bytes:
        return "utf-8"
    m = _META_CHARSET_RE.search(html_bytes[:1024])
    if m:
        cs = m.group(1).decode("ascii", "ignore").lower()
        if cs in _KNOWN_CHARSETS:
            return cs
    return "utf-8"


def decode_html(html_bytes: bytes | None) -> str:
    """Bytes → str per spec: sniffed charset, utf-8-with-replacement fallback."""
    if html_bytes is None:
        return ""
    cs = sniff_charset(html_bytes)
    try:
        return html_bytes.decode(cs, errors="replace")
    except LookupError:
        return html_bytes.decode("utf-8", errors="replace")


# --- text extraction --------------------------------------------------------

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[\s ]+")

# Exactly the five XML defaults + &nbsp; (FIXTURES.md §B.2). &amp; last so
# that double-escaped sequences (&amp;lt;) decode one level only.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _text_from_script_stripped(s: str) -> str:
    """§B.2 pipeline AFTER the script-strip step (shared with links)."""
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _decode_entities(s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def extract_text(html_bytes: bytes | None) -> str:
    """FIXTURES.md §B.2 canonical extraction; the byte-identity oracle."""
    s = decode_html(html_bytes)
    if not s:
        return ""
    return _text_from_script_stripped(_SCRIPT_RE.sub(" ", s))


# --- link extraction --------------------------------------------------------

_HREF_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_BASE_RE = re.compile(
    r"""<base\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE,
)
# <meta http-equiv="refresh" content="0; url=...">  (redirect encoding in the
# synthetic corpus; the reference follows HTTP 3xx — SURVEY.md §2C op 20)
_META_REFRESH_RE = re.compile(
    r"""<meta\b[^>]*http-equiv\s*=\s*["']?refresh["']?[^>]*
        \bcontent\s*=\s*["'][^"']*url\s*=\s*([^"'\s>]+)""",
    re.IGNORECASE | re.VERBOSE,
)


def _links_from_script_stripped(s: str, base_url: str) -> list[str]:
    """Link scan AFTER the script-strip step (shared with text)."""
    return _links_from_comment_stripped(_COMMENT_RE.sub(" ", s), base_url)


def _links_from_comment_stripped(s: str, base_url: str) -> list[str]:
    bm = _BASE_RE.search(s)
    if bm:
        base_url = urljoin(base_url, next(g for g in bm.groups() if g is not None))
    out: list[str] = []
    for m in _HREF_RE.finditer(s):
        href = next(g for g in m.groups() if g is not None)
        href = _decode_entities(href).strip()
        if not href or href.startswith(("javascript:", "mailto:", "data:", "#")):
            continue
        absu = urljoin(base_url, href)
        if absu.startswith(("http://", "https://")):
            out.append(absu)
    return out


def extract_links(html_bytes: bytes | None, base_url: str) -> list[str]:
    """All a[href] values resolved to absolute URLs (honors <base href>).

    Returns absolute http(s) URLs only, in document order, duplicates kept
    (in-wave dedup is a relational op downstream — SURVEY.md §2B op 14).
    """
    s = decode_html(html_bytes)
    if not s:
        return []
    return _links_from_script_stripped(_SCRIPT_RE.sub(" ", s), base_url)


def redirect_target(html_bytes: bytes | None, base_url: str) -> str | None:
    """Meta-refresh redirect target (absolute), or None."""
    s = decode_html(html_bytes)
    if not s:
        return None
    m = _META_REFRESH_RE.search(s)
    if not m:
        return None
    return urljoin(base_url, _decode_entities(m.group(1)).strip())


# --- combined single-pass kernel (the engine's hot path) ---------------------

def process_html(
    html_bytes: bytes | None, base_url: str,
    extra_patterns: tuple | None = None,
) -> tuple:
    """(redirect_to, text, links) in ONE decode of the payload.

    Byte-identical to calling redirect_target / extract_text /
    extract_links separately (each kernel is the same pipeline split at
    the shared script-strip step) — but the fat html column crosses the
    JVM→Python Arrow boundary once instead of three times, and the
    charset decode runs once.  Redirect pages skip extraction entirely
    (the engine nulls their text/links anyway).

    *extra_patterns*: optional compiled (regex, group) hooks collecting
    additional link attributes (the reference's CollectAdditionalLinks
    -style delegates) — appended after the a[href] links, same
    resolution/filter rules.
    """
    s0 = decode_html(html_bytes)
    if not s0:
        return None, "", []
    m = _META_REFRESH_RE.search(s0)
    if m:
        return urljoin(base_url, _decode_entities(m.group(1)).strip()), None, []
    s1 = _SCRIPT_RE.sub(" ", s0)
    text = _text_from_script_stripped(s1)
    s2 = _COMMENT_RE.sub(" ", s1)
    links = _links_from_comment_stripped(s2, base_url)
    if extra_patterns:
        links = links + _hook_links(s2, base_url, extra_patterns)
    return None, text, links


def _hook_links(s: str, base_url: str, patterns) -> list[str]:
    """Apply configurable link-collection hooks to stripped html."""
    out: list[str] = []
    for rx in patterns:
        for m in rx.finditer(s):
            href = next((g for g in m.groups() if g is not None), None)
            if href is None:
                continue
            href = _decode_entities(href).strip()
            if not href or href.startswith(
                ("javascript:", "mailto:", "data:", "#")
            ):
                continue
            absu = urljoin(base_url, href)
            if absu.startswith(("http://", "https://")):
                out.append(absu)
    return out


# --- Spark UDF surface (Arrow-batched) --------------------------------------

PROCESSED_SCHEMA = StructType([
    StructField("redirect_to", StringType()),
    StructField("text", StringType()),
    StructField("links", ArrayType(StringType())),
])


def make_process_html_udf(link_patterns: tuple = ()):
    """Combined redirect+text+links UDF — the engine's one Python
    boundary per wave (3 separate UDFs = 3 Arrow transfers of the fat
    html column + 3 charset decodes; measured ~3× the Python-side cost).

    *link_patterns*: regex strings with one capture group each (the
    CollectAdditionalLinks-style hooks from CrawlConfig), compiled once
    per executor task.
    """
    pats = tuple(link_patterns or ())

    @F.pandas_udf(PROCESSED_SCHEMA)
    def process_html_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        compiled = tuple(
            re.compile(p, re.IGNORECASE | re.DOTALL) for p in pats
        ) or None
        rts, texts, links = [], [], []
        for h, u in zip(html, url):
            rt, tx, lk = process_html(h, u, compiled)
            rts.append(rt)
            texts.append(tx)
            links.append(lk)
        return pd.DataFrame(
            {"redirect_to": rts, "text": texts, "links": links}
        )

    return process_html_udf


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links(h, u) for h, u in zip(html, url)], dtype=object
    )


@F.pandas_udf(StringType())
def redirect_target_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [redirect_target(h, u) for h, u in zip(html, url)], dtype=object
    )
