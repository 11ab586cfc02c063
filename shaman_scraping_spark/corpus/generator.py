"""Deterministic synthetic web corpus (FIXTURES.md §B).

Produces the ``pages`` table in exactly the shape fixed by
BASELINE.json's input_hint — ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)`` — plus a ``seeds`` list.
No external data; everything derives from ``random.Random(seed)``
(no wall-clock, no unordered iteration → byte-stable across runs).

The golden ``text`` column is computed STRUCTURALLY from the visible
fragments the renderer emits (never by calling the engine's extractor),
so pytest's byte-identity assertion extract_text(html) == text is a
genuine cross-check of two independent implementations of the
FIXTURES.md §B.2 spec.

Corpus features (each keyed to the SURVEY.md §2 operator it exercises):
  * ~n_hosts hosts with zipf-distributed page counts      (ops 32, 33)
  * per-host link tree of branching 3 → depth ≥ 4         (op 22 BFS)
  * cross-host links                                      (op 11 scope)
  * robots.txt row per host: Disallow/Allow prefixes +
    Crawl-delay ∈ {0, 1, 5}                               (ops 7, 16–18)
  * /private/** pages that are linked but disallowed,
    /private/ok/** allowed by a longer Allow rule         (op 18)
  * ~5% meta-refresh redirect rows                        (op 20)
  * link spellings that canonicalize to the same URL
    (uppercase host, unsorted query, fragments, :80)      (op 8)
  * ~5% latin-1 rows with <meta charset>                  (op 26)
  * &amp;/&lt;/&nbsp; entities in visible text            (op 25)
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_VOCAB = {
    "en": ("the quick brown fox jumps over lazy dog crawl web page link data "
           "engine spark frontier archive record fetch host depth wave").split(),
    "de": ("der schnelle braune fuchs springt über den faulen hund seite "
           "netz daten maschine grenze archiv aufzeichnung tiefe welle").split(),
    "fr": ("le rapide renard brun saute par dessus chien paresseux page "
           "toile données moteur frontière archive profondeur vague").split(),
    "es": ("el rápido zorro marrón salta sobre perro perezoso página red "
           "datos motor frontera archivo registro profundidad ola").split(),
}
_SPECIAL_TOKENS = ["AT&T", "a<b", "x>y", 'say"hi"', "it's"]  # entity round-trips


def _escape(s: str) -> str:
    """Text → HTML content encoding (inverse of the §B.2 entity decode)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


@dataclass
class CorpusSpec:
    n_hosts: int = 50
    n_pages: int = 500          # content pages across all hosts (pre-robots)
    seed: int = 42
    redirect_frac: float = 0.05
    latin1_frac: float = 0.05
    cross_link_frac: float = 0.2
    variant_link_frac: float = 0.15
    paragraphs_per_page: int = 3
    branching: int = 3          # link-tree fan-out per page
    crawl_delays: tuple = (0, 1, 5)
    langs: tuple = ("en", "de", "fr", "es")
    # fraction of hosts whose robots.txt disallows /private (rest allow all)
    private_frac: float = 0.5
    # fraction of hosts with a robots-declared sitemap listing a slice
    # of their pages PLUS orphan pages reachable only via the sitemap
    # (op 49).  0 (default) adds nothing and consumes no rng draws —
    # existing corpora and goldens stay byte-identical.
    sitemap_frac: float = 0.0
    # RFC 9309 §2.2.3 wildcard rules: private hosts additionally get
    # `Disallow: /p/*3$` (blocks tree pages whose path ends in 3).
    # Default off; adds no rng draws.
    wildcard_robots: bool = False


@dataclass
class Corpus:
    """In-memory corpus + ground-truth side tables for the oracle simulator."""
    rows: list = field(default_factory=list)      # (url, warc_ts, html, text, lang)
    seeds: list = field(default_factory=list)     # seed URLs (possibly variant-spelled)
    robots: dict = field(default_factory=dict)    # host -> (rules, crawl_delay)
    # rules: list[(allow: bool, prefix: str)]
    sitemaps: dict = field(default_factory=dict)  # host -> [listed urls]
    orphans: dict = field(default_factory=dict)   # host -> [sitemap-only urls]

    def schema(self) -> pa.schema:
        return pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        )

    def to_arrow(self) -> pa.Table:
        urls, tss, htmls, texts, langs = zip(*self.rows)
        return pa.table(
            {
                "url": list(urls),
                "warc_ts": list(tss),
                "html": list(htmls),
                "text": list(texts),
                "lang": list(langs),
            },
            schema=self.schema(),
        )

    def write(self, out_dir: str | Path,
              row_group_size: int = 2048) -> Path:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        # Bounded row groups make the single file SPLITTABLE: Spark
        # assigns byte-range splits per row group, so a scan fans out
        # across cores.  pyarrow's default (~1M rows) packed the whole
        # corpus into ONE row group → every corpus scan + UDF stage ran
        # as a single task and no parallelism level could help (the r1
        # "local[32] slower than local[8]" scaling mystery).
        pq.write_table(self.to_arrow(), out / "pages.parquet",
                       row_group_size=row_group_size)
        (out / "seeds.txt").write_text("\n".join(self.seeds) + "\n")
        return out


def _zipf_counts(n_hosts: int, n_pages: int) -> list[int]:
    weights = [1.0 / (i + 1) for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(1, int(round(n_pages * w / total))) for w in weights]
    return counts


def _variant_spelling(url: str, rng: random.Random) -> str:
    """A non-canonical spelling that canonicalizes back to *url*."""
    scheme, rest = url.split("://", 1)
    host, _, pathq = rest.partition("/")
    pathq = "/" + pathq
    choice = rng.randrange(4)
    if choice == 0:
        host = host.upper()
    elif choice == 1:
        host = host + (":80" if scheme == "http" else ":443")
    elif choice == 2:
        pathq = pathq + "#frag%d" % rng.randrange(10)
    else:
        if "?" in pathq:
            base, q = pathq.split("?", 1)
            params = q.split("&")
            rng.shuffle(params)
            pathq = base + "?" + "&".join(params)
        else:
            scheme = scheme.upper()
    return f"{scheme}://{host}{pathq}"


def generate_corpus(spec: CorpusSpec = CorpusSpec()) -> Corpus:
    rng = random.Random(spec.seed)
    corpus = Corpus()
    counts = _zipf_counts(spec.n_hosts, spec.n_pages)
    hosts = [f"host{i:02d}.example" for i in range(spec.n_hosts)]
    host_lang = {h: spec.langs[i % len(spec.langs)] for i, h in enumerate(hosts)}

    # --- per-host URL universe -------------------------------------------
    # page 0 is "/", page j>0 is "/p/j"; tree: j links to 3j+1..3j+3.
    # A slice of each big host's tail pages live under /private/ (op 18)
    # and /private/ok/ (allow-override); ~redirect_frac become /r/k rows.
    host_urls: dict[str, list[str]] = {}
    private_hosts = set()
    for i, h in enumerate(hosts):
        n = counts[i]
        urls = []
        has_private = rng.random() < spec.private_frac
        if has_private:
            private_hosts.add(h)
        for j in range(n):
            if j == 0:
                path = "/"
            elif has_private and n >= 20 and j % 17 == 0:
                path = f"/private/{j}"
            elif has_private and n >= 20 and j % 19 == 0:
                path = f"/private/ok/{j}"
            elif j % 7 == 3:
                path = f"/p/{j}?id={j}&ref=tree"   # query-bearing (op 8)
            else:
                path = f"/p/{j}"
            urls.append(f"http://{h}{path}")
        host_urls[h] = urls

    # --- sitemap planning (op 49; every rng draw guarded so a 0 frac
    # consumes no randomness — existing corpora stay byte-identical) --------
    sitemap_hosts: dict[str, dict] = {}
    if spec.sitemap_frac > 0:
        first_sm = True
        for h in hosts:
            if rng.random() >= spec.sitemap_frac:
                continue
            orphans = [f"http://{h}/orphan/{k}" for k in range(3)]
            listed = [u for j, u in enumerate(host_urls[h]) if j % 3 == 0]
            listed += orphans
            # the first sitemap host exercises the sitemapindex path
            sitemap_hosts[h] = {"listed": listed, "index": first_sm}
            first_sm = False
            corpus.sitemaps[h] = listed
            corpus.orphans[h] = orphans

    # --- robots.txt per host ---------------------------------------------
    for i, h in enumerate(hosts):
        delay = spec.crawl_delays[i % len(spec.crawl_delays)]
        rules = []
        if h in private_hosts:
            rules = [(False, "/private"), (True, "/private/ok")]
            if spec.wildcard_robots:
                rules.append((False, "/p/*3$"))
        body_lines = ["User-agent: *"]
        for allow, prefix in rules:
            body_lines.append(("Allow: " if allow else "Disallow: ") + prefix)
        if delay > 0:
            body_lines.append(f"Crawl-delay: {delay}")
        if h in sitemap_hosts:
            body_lines.append(f"Sitemap: http://{h}/sitemap.xml")
        body = "\n".join(body_lines) + "\n"
        corpus.robots[h] = (rules, float(delay))
        # robots bodies are plain text; golden text per §B.2 = ws-collapsed
        golden = " ".join(body.split())
        corpus.rows.append(
            (f"http://{h}/robots.txt", BASE_TS, body.encode("utf-8"),
             golden, host_lang[h])
        )

    # --- content + redirect pages ----------------------------------------
    ts_counter = 0
    for i, h in enumerate(hosts):
        lang = host_lang[h]
        vocab = _VOCAB[lang]
        n = counts[i]
        urls = host_urls[h]
        for j, url in enumerate(urls):
            ts_counter += 1
            warc_ts = BASE_TS.replace(second=0) + _ts_delta(ts_counter)
            is_redirect = j > 0 and rng.random() < spec.redirect_frac
            # children in this host's tree
            b = spec.branching
            children = [urls[c] for c in range(b * j + 1, b * j + b + 1)
                        if c < n]
            links = list(children)
            if rng.random() < spec.cross_link_frac:
                other = hosts[(i + 1 + rng.randrange(len(hosts) - 1)) % len(hosts)]
                links.append(f"http://{other}/")
            # variant spellings of existing URLs (canonicalization tests)
            links = [
                _variant_spelling(u, rng)
                if rng.random() < spec.variant_link_frac else u
                for u in links
            ]
            if is_redirect and children:
                target = children[0]
                html = (
                    "<html><head><meta http-equiv=\"refresh\" "
                    f"content=\"0; url={target}\"></head><body></body></html>"
                ).encode("utf-8")
                corpus.rows.append((url, warc_ts, html, "", lang))
                continue
            latin1 = lang in ("es", "fr") and rng.random() < spec.latin1_frac * 4
            html, text = _render_page(url, links, vocab, rng,
                                      spec.paragraphs_per_page, latin1)
            corpus.rows.append((url, warc_ts, html, text, lang))

    # --- sitemap + orphan rows (op 49) ------------------------------------
    if sitemap_hosts:
        from shaman_scraping_spark.functions.html import extract_text

        def _urlset(urls):
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                'sitemap/0.9">\n'
                + "".join(f"<url><loc>{u}</loc></url>\n" for u in urls)
                + "</urlset>\n"
            )
            return body.encode("utf-8")

        for h in sorted(sitemap_hosts):
            info = sitemap_hosts[h]
            lang = host_lang[h]
            vocab = _VOCAB[lang]
            for ou in corpus.orphans[h]:
                ts_counter += 1
                warc_ts = BASE_TS.replace(second=0) + _ts_delta(ts_counter)
                html, text = _render_page(
                    ou, [], vocab, rng, spec.paragraphs_per_page, False
                )
                corpus.rows.append((ou, warc_ts, html, text, lang))
            listed = info["listed"]
            docs: list[tuple[str, bytes]] = []
            if info["index"] and len(listed) >= 2:
                mid = len(listed) // 2
                child_urls = [f"http://{h}/sitemap-{n}.xml"
                              for n in range(2)]
                idx = (
                    '<?xml version="1.0" encoding="UTF-8"?>\n'
                    '<sitemapindex xmlns="http://www.sitemaps.org/'
                    'schemas/sitemap/0.9">\n'
                    + "".join(f"<sitemap><loc>{cu}</loc></sitemap>\n"
                              for cu in child_urls)
                    + "</sitemapindex>\n"
                ).encode("utf-8")
                docs.append((f"http://{h}/sitemap.xml", idx))
                docs.append((child_urls[0], _urlset(listed[:mid])))
                docs.append((child_urls[1], _urlset(listed[mid:])))
            else:
                docs.append((f"http://{h}/sitemap.xml", _urlset(listed)))
            for su, body in docs:
                ts_counter += 1
                warc_ts = BASE_TS.replace(second=0) + _ts_delta(ts_counter)
                # golden text via the SHARED extraction kernel, like
                # every other corpus row (byte-identity invariant)
                corpus.rows.append(
                    (su, warc_ts, body, extract_text(body), lang)
                )

    # --- seeds: roots of ~10 hosts, some variant-spelled ------------------
    seed_hosts = hosts[: min(10, len(hosts))]
    for k, h in enumerate(seed_hosts):
        u = f"http://{h}/"
        corpus.seeds.append(_variant_spelling(u, rng) if k % 3 == 2 else u)
    return corpus


def _ts_delta(seconds: int):
    from datetime import timedelta

    return timedelta(seconds=seconds)


def _render_page(
    url: str,
    links: list[str],
    vocab: list[str],
    rng: random.Random,
    n_paragraphs: int,
    latin1: bool,
) -> tuple[bytes, str]:
    """Render HTML and compute the golden text structurally.

    The renderer tracks every visible text fragment it emits, in order;
    golden = " ".join(fragments) with each fragment already internally
    single-spaced.  Scripts/styles/comments contribute nothing.
    """
    frags: list[str] = []

    def words(n: int) -> str:
        toks = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.1:
            toks[rng.randrange(len(toks))] = rng.choice(_SPECIAL_TOKENS)
        return " ".join(toks)

    title = words(3)
    frags.append(title)
    parts = [
        "<!DOCTYPE html>\n<html>\n<head>\n",
    ]
    if latin1:
        parts.append('<meta charset="iso-8859-1">\n')
    parts.append(f"<title>{_escape(title)}</title>\n")
    parts.append("<script>var x = '<not text>' && 1;</script>\n")
    parts.append("<style>body { color: #000; }</style>\n")
    parts.append("</head>\n<body>\n<!-- generated: seed corpus -->\n")
    for _ in range(n_paragraphs):
        sent = words(rng.randrange(6, 14))
        frags.append(sent)
        sep = "&nbsp;" if rng.random() < 0.2 else "\n  "
        halves = sent.split(" ")
        mid = len(halves) // 2
        left, right = " ".join(halves[:mid]), " ".join(halves[mid:])
        if left and right:
            parts.append(f"<p>{_escape(left)}{sep}{_escape(right)}</p>\n")
        else:
            parts.append(f"<p>{_escape(sent)}</p>\n")
    for li, link in enumerate(links):
        anchor = words(2)
        frags.append(anchor)
        parts.append(f'<a href="{_escape(link)}">{_escape(anchor)}</a>\n')
    parts.append("</body>\n</html>\n")
    doc = "".join(parts)
    if latin1:
        # keep only latin-1-encodable corpora for these rows
        raw = doc.encode("iso-8859-1", errors="replace")
    else:
        raw = doc.encode("utf-8")
    golden = " ".join(" ".join(f.split()) for f in frags if f).strip()
    if latin1:
        # golden must match what a latin-1 decode yields
        golden = raw.decode("iso-8859-1")
        golden = _golden_from_roundtrip(golden)
    return raw, golden


def _golden_from_roundtrip(decoded_doc: str) -> str:
    """For charset-lossy rows, recompute golden from the decoded doc using
    the same structural rules (strip script/style/comment/tags, entities,
    collapse).  Kept tiny and regex-free-ish: reuses the renderer's known
    structure is impossible post-encode, so this mirrors §B.2 minimally.
    """
    import re

    s = re.sub(r"<script\b[^>]*>.*?</script\s*>", " ", decoded_doc,
               flags=re.I | re.S)
    s = re.sub(r"<style\b[^>]*>.*?</style\s*>", " ", s, flags=re.I | re.S)
    s = re.sub(r"<!--.*?-->", " ", s, flags=re.S)
    s = re.sub(r"<[^>]*>", " ", s)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        s = s.replace(ent, ch)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


TINY = CorpusSpec(n_hosts=12, n_pages=160)
SMALL = CorpusSpec(n_hosts=50, n_pages=20_000)


def main() -> None:  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--pages", type=int, default=20_000)
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    spec = CorpusSpec(n_hosts=args.hosts, n_pages=args.pages, seed=args.seed)
    out = generate_corpus(spec).write(args.out_dir)
    print(f"wrote {out}")


if __name__ == "__main__":  # pragma: no cover
    main()
