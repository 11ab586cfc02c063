"""Sequential oracle crawler — the reference-behavior stand-in.

A deliberately simple, single-threaded, dict-and-list implementation
of the exact wave semantics pinned in config.py (the same role the
reference's single-process C# scheduler plays: one deterministic
ground-truth ordering).  tests/test_crawl_e2e.py asserts the Spark
engine's emission log / seen set / quota log / lineage totals equal
this simulator's, which is the BASELINE.json "crawl-ordering equality
under the same seed list + politeness budget" gate.

Implementation independence: shares only the pure-Python *kernels*
(canonicalizer twin, HTML extraction, robots parsing) with the
engine — the orchestration (scheduling, politeness, dedup, ordering)
is written separately from the DataFrame version, so disagreement
exposes real bugs in either side's control flow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from shaman_scraping_spark.config import UNLIMITED_QUOTA, CrawlConfig
from shaman_scraping_spark.corpus.generator import Corpus
from shaman_scraping_spark.functions.html import process_html
from shaman_scraping_spark.functions.url import (
    canonicalize_url_py, url_template_of,
)
from shaman_scraping_spark.operators.politeness import (
    parse_robots, robots_allowed, url_path_of,
)


@dataclass
class SimResult:
    emissions: list = field(default_factory=list)  # (wave, rank, url, depth, host)
    seen: set = field(default_factory=set)         # url_canon
    quota_log: list = field(default_factory=list)  # (host, wave, quota, emitted)
    wave_totals: list = field(default_factory=list)  # (wave, urls, bytes)
    fetched: list = field(default_factory=list)    # (url_canon, wave, status)
    dead: list = field(default_factory=list)  # (url, host, depth, attempt, wave)
    waves_run: int = 0


def _host_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[1]
    hostport = rest.split("/", 1)[0]
    if hostport.startswith("["):  # IPv6 literal keeps its brackets
        return hostport[: hostport.index("]") + 1]
    return hostport.rsplit(":", 1)[0] if ":" in hostport else hostport


def _parent_key(parent: str | None):
    return (0, "") if parent is None else (1, parent)


def simulate(corpus: Corpus, config: CrawlConfig) -> SimResult:
    res = SimResult()
    cfg = config
    # content processing goes through the SAME combined kernel as the
    # engine's UDF (incl. the CollectAdditionalLinks-style hook
    # patterns) — parity by construction
    import re as _re

    hook_pats = tuple(
        _re.compile(p, _re.IGNORECASE | _re.DOTALL)
        for p in (cfg.link_patterns or ())
    ) or None

    # corpus lookup by canonical url (earliest capture wins on dup
    # canon).  Tiebreak mirrors the engine's dedup window ordering
    # exactly — (warc_ts, url, xxhash64(html)) — so two captures
    # sharing (ts, url) but differing in html pick the same content-
    # deterministic winner here and in plans/engine.py (ADVICE r3);
    # beyond that only byte-identical captures remain, where the
    # engine's file-order __rid tiebreak cannot change content.
    from shaman_scraping_spark.functions.hashing import xxh64

    by_canon: dict[str, tuple] = {}
    by_canon_key: dict[str, tuple] = {}
    for url, ts, html, text, lang in corpus.rows:
        c = canonicalize_url_py(url)
        if c is None:
            continue
        k = (ts, url, xxh64(html))
        if c not in by_canon or k < by_canon_key[c]:
            by_canon[c] = (ts, url, html, text, lang)
            by_canon_key[c] = k

    def in_scope(url_canon: str, host: str, depth: int) -> bool:
        if cfg.allowed_hosts is not None and host not in cfg.allowed_hosts:
            return False
        if cfg.include_regex:
            import re
            if not re.search(cfg.include_regex, url_canon):
                return False
        if cfg.exclude_regex:
            import re
            if re.search(cfg.exclude_regex, url_canon):
                return False
        return depth <= cfg.max_depth

    # frontier: url_canon -> (depth, wave_discovered, parent_sort_key)
    frontier: dict[str, tuple] = {}
    for s in cfg.seeds:
        c = canonicalize_url_py(s)
        if c is None:
            continue
        h = _host_of(c)
        if not in_scope(c, h, 0):
            continue
        prev = frontier.get(c)
        cand = (0, 0, _parent_key(None))
        if prev is None or cand < prev:
            frontier[c] = cand

    # op 52 twin: deterministic transient failures + retry/backoff
    # (config.py spec).  flaky uses the XXH64 twin on the UTF-8 bytes
    # of url_canon — bit-identical to the engine's
    # pmod(xxhash64(url_canon), 1000) (signed semantics: the twin
    # returns Spark's signed long; Python's % is pmod)
    retry_on = cfg.flaky_permille > 0

    def flaky(c: str) -> bool:
        return retry_on and xxh64(c.encode()) % 1000 < cfg.flaky_permille

    pending: dict[str, tuple] = {}  # url -> (depth, attempt, due_wave)

    # op 54 twin: crawl-trap guard (config.py spec).  tcounts
    # accumulates first-attempt fetch counts per (host, template);
    # the trap set is snapshotted at each wave's gate from the counts
    # of strictly earlier waves — exactly the engine's
    # newest-manifest-before read of the trap_counts table.
    trap_on = cfg.trap_threshold > 0
    tcounts: dict[tuple, int] = {}

    def count_fetch(c: str, h: str) -> None:
        if trap_on:
            k = (h, url_template_of(c))
            tcounts[k] = tcounts.get(k, 0) + 1

    # host -> dict(rules, delay, tokens, budget_used)
    host_state: dict[str, dict] = {}
    # transient robots lookups (hop targets probe robots WITHOUT
    # registering the host in host_state — mirrors the engine, whose
    # quota/host_state tables grow from FRONTIER hosts only)
    robots_cache: dict[str, tuple] = {}

    def robots_of(h: str) -> tuple:
        if h not in robots_cache:
            robots_url = f"http://{h}/robots.txt"
            entry = by_canon.get(robots_url) or by_canon.get(
                f"https://{h}/robots.txt"
            )
            if entry is not None:
                from shaman_scraping_spark.functions.html import decode_html
                robots_cache[h] = parse_robots(decode_html(entry[2]),
                                               cfg.default_crawl_delay,
                                               cfg.user_agent)
            else:
                robots_cache[h] = ([], cfg.default_crawl_delay)
        return robots_cache[h]

    # op 49: sitemap locs found while registering this wave's new
    # hosts; consumed as wave-w discoveries at depth 0 in step 5
    # (sources/sitemap.py pins the spec; same regexes as the engine)
    sitemap_found: list[tuple[str, str]] = []   # (loc url, src canon)

    def collect_sitemaps(h: str) -> None:
        from shaman_scraping_spark.functions.html import decode_html
        from shaman_scraping_spark.sources.sitemap import (
            is_sitemap_index, sitemap_locs, sitemap_urls_of_robots,
        )

        entry = by_canon.get(f"http://{h}/robots.txt") or by_canon.get(
            f"https://{h}/robots.txt"
        )
        body = decode_html(entry[2]) if entry is not None else None
        for su in sitemap_urls_of_robots(body):
            sc = canonicalize_url_py(su)
            e = by_canon.get(sc) if sc else None
            if e is None:
                continue
            b = decode_html(e[2])
            if is_sitemap_index(b):
                for cu in sitemap_locs(b):
                    cc = canonicalize_url_py(cu)
                    ce = by_canon.get(cc) if cc else None
                    if ce is None:
                        continue
                    cb = decode_html(ce[2])
                    if is_sitemap_index(cb):
                        continue        # nested indexes ignored (spec)
                    for loc in sitemap_locs(cb):
                        sitemap_found.append((loc, cc))
            else:
                for loc in sitemap_locs(b):
                    sitemap_found.append((loc, sc))

    def ensure_host(h: str, wave: int) -> None:
        if h in host_state:
            return
        rules, delay = robots_of(h)
        # closed-form clock (config.py spec): tokens are as-of END of
        # wave_updated; new hosts register at 0 as of the wave before
        # discovery so their first refill gap is 1
        host_state[h] = {
            "rules": rules, "delay": delay, "tokens": 0.0, "budget": 0,
            "wave_updated": wave - 1,
        }
        if getattr(cfg, "use_sitemaps", False):
            collect_sitemaps(h)

    for wave in range(cfg.max_waves):
        if not frontier and not pending:
            res.waves_run = wave
            return res
        # 1. refill — closed form, one saturating step over the whole
        # gap (config.py wave-clock spec; the engine's lazy-refill
        # arithmetic is the SAME expression, so floats round
        # identically in every layout)
        for c in frontier:
            ensure_host(_host_of(c), wave)
        quotas: dict[str, int] = {}
        avail: dict[str, float] = {}
        for h, st in sorted(host_state.items()):
            gap = wave - st["wave_updated"]
            if st["delay"] > 0:
                avail[h] = min(
                    cfg.bucket_cap,
                    st["tokens"] + gap * (cfg.wave_seconds / st["delay"]),
                )
                q = math.floor(avail[h])
            else:
                avail[h] = cfg.bucket_cap
                q = UNLIMITED_QUOTA
            if cfg.max_pages_per_host is not None:
                q = min(q, max(0, cfg.max_pages_per_host - st["budget"]))
            quotas[h] = q

        # 2. trap gate (op 54, strictly-before counts) → robots gate
        traps = (
            {k for k, v in tcounts.items() if v >= cfg.trap_threshold}
            if trap_on else ()
        )
        # tuples: (depth, wave_disc, parent_key, url, host, attempt)
        eligible: list[tuple] = []
        for c, (depth, wdisc, pkey) in frontier.items():
            h = _host_of(c)
            if trap_on and (h, url_template_of(c)) in traps:
                res.seen.add(c)   # trapped — dropped permanently
                continue
            st = host_state[h]
            if robots_allowed(url_path_of(c), st["rules"]):
                eligible.append((depth, wdisc, pkey, c, h, 0))
            else:
                res.seen.add(c)   # dropped permanently
        # op 52: retries due this wave re-enter after the seen filter
        # (they are seen) and before top-k — engine twin of the
        # _load_due_retries union.  wdisc = due wave, parent = None.
        if pending:
            for c in sorted([u for u, p in pending.items()
                             if p[2] == wave]):
                depth, att, _due = pending.pop(c)
                h = _host_of(c)
                ensure_host(h, wave)
                if robots_allowed(url_path_of(c),
                                  host_state[h]["rules"]):
                    eligible.append(
                        (depth, wave, _parent_key(None), c, h, att)
                    )
        # 3. per-host top-k by (depth, discovery_ts≡wave_disc, url_canon)
        per_host: dict[str, list] = {}
        for depth, wdisc, pkey, c, h, att in eligible:
            per_host.setdefault(h, []).append((depth, wdisc, c, att))
        scheduled: list[tuple] = []   # (depth, wdisc, url, host, attempt)
        remaining: dict[str, tuple] = {}
        for h in sorted(per_host):
            rows = sorted(per_host[h])  # (depth, wave_disc, url) lexicographic
            q = quotas[h]
            for i, (depth, wdisc, c, att) in enumerate(rows):
                if i < q:
                    scheduled.append((depth, wdisc, c, h, att))
                elif att > 0:
                    # quota-starved retry: wait a wave, same attempt
                    pending[c] = (depth, att, wave + 1)
                else:
                    remaining[c] = frontier[c]

        # 4. emission log, global order (depth, discovery_ts, url_canon)
        scheduled.sort()
        for rank, (depth, wdisc, c, h, att) in enumerate(scheduled, start=1):
            res.emissions.append((wave, rank, c, depth, h))

        # quota log
        emitted_by_host: dict[str, int] = {}
        for _, _, c, h, _att in scheduled:
            emitted_by_host[h] = emitted_by_host.get(h, 0) + 1
        for h in sorted(quotas):
            res.quota_log.append(
                (h, wave, quotas[h], emitted_by_host.get(h, 0))
            )

        # 5. fetch + link discovery (+ in-wave redirect hops, op 20 —
        # level-synchronous with min-(depth, parent) dedup per level,
        # mirroring the engine's per-level dedup_urls; spec pinned in
        # config.py max_redirect_hops)
        wave_bytes = 0
        fetch_count = 0
        discoveries: dict[str, tuple] = {}
        scheduled_set = {c for _, _, c, _, _ in scheduled}
        hop_cand: dict[str, tuple] = {}   # target -> (depth, parent) min

        def discover(lc: str, depth: int, parent: str) -> None:
            lh = _host_of(lc)
            if not in_scope(lc, lh, depth):
                return
            cand = (depth, wave + 1, _parent_key(parent))
            prev = discoveries.get(lc)
            if prev is None or cand < prev:
                discoveries[lc] = cand

        # op 49: sitemap locs of hosts registered this wave are wave-w
        # discoveries at depth 0 (parent = the sitemap document) —
        # engine twin: the sm_links union in plans/engine.py step 5
        for loc, src in sitemap_found:
            lc = canonicalize_url_py(loc)
            if lc is not None:
                discover(lc, 0, src)
        sitemap_found.clear()

        def walk_chain(src: str, d0: int) -> None:
            """Collect redirect-chain candidates along the STATIC graph
            (closure semantics, config.py): seen intermediates don't
            stop the walk; blocked / out-of-scope / missing nodes do."""
            from shaman_scraping_spark.functions.html import (
                redirect_target,
            )

            cur, d = src, d0
            for _k in range(cfg.max_redirect_hops):
                entry = by_canon.get(cur)
                if entry is None:
                    break
                rt = redirect_target(entry[2], cur)
                if rt is None:
                    break
                lc = canonicalize_url_py(rt)
                if lc is None:
                    break
                lh = _host_of(lc)
                if not in_scope(lc, lh, d + 1):
                    break
                key = (d + 1, cur)
                prev = hop_cand.get(lc)
                if prev is None or key < prev:
                    hop_cand[lc] = key
                rules, _dl = robots_of(lh)
                if not robots_allowed(url_path_of(lc), rules):
                    break  # blocked target is never fetched → no edge out
                cur, d = lc, d + 1

        for depth, wdisc, c, h, att in scheduled:
            res.seen.add(c)
            fetch_count += 1
            if att == 0:
                # op 54: first attempts count toward the template,
                # whatever the status (engine: fdf attempt-0 rows)
                count_fetch(c, h)
            entry = by_canon.get(c)
            if entry is None:
                res.fetched.append((c, wave, 404))
                continue
            if flaky(c) and att < cfg.flaky_fail_attempts:
                # op 52: transient 503 — no body, no Location, no
                # links; quota was spent.  Re-enter at the backoff
                # wave or dead-letter (engine twin of the failed→
                # retries/dead split in run_wave)
                res.fetched.append((c, wave, 503))
                na = att + 1
                if na <= cfg.max_retries:
                    pending[c] = (depth, na, wave + (1 << (na - 1)))
                else:
                    res.dead.append((c, h, depth, na, wave))
                continue
            _ts, _url, html, _text, _lang = entry
            wave_bytes += len(html) if html is not None else 0
            rt, _text2, links = process_html(html, c, hook_pats)
            if rt is not None:
                res.fetched.append((c, wave, 302))
                lc = canonicalize_url_py(rt)
                if lc is not None:
                    discover(lc, depth + 1, c)      # frontier path (seen-
                walk_chain(c, depth)                # filtered at merge)
            else:
                res.fetched.append((c, wave, 200))
                for link in links:
                    lc = canonicalize_url_py(link)
                    if lc is not None:
                        discover(lc, depth + 1, c)

        # process hop candidates (already the full ≤k-hop closure of
        # the scheduled set — one pass, no level iteration)
        fetched_this_wave = set(scheduled_set)
        for lc in sorted(hop_cand):
            d1, _parent = hop_cand[lc]
            if lc in res.seen or lc in fetched_this_wave:
                continue
            rules, _delay = robots_of(_host_of(lc))
            if not robots_allowed(url_path_of(lc), rules):
                res.seen.add(lc)                    # blocked → seen
                continue
            fetched_this_wave.add(lc)
            res.seen.add(lc)
            fetch_count += 1
            # op 54: hop fetches are first attempts and count toward
            # the template (they bypass only the frontier gate)
            count_fetch(lc, _host_of(lc))
            entry = by_canon.get(lc)
            if entry is None:
                res.fetched.append((lc, wave, 404))
                continue
            if flaky(lc) and 0 < cfg.flaky_fail_attempts:
                # hop target's own flaky draw (attempt 0; the static
                # closure is not pruned by an intermediate's 503 —
                # config.py op-52 spec; engine: hop_keys attempt 0)
                res.fetched.append((lc, wave, 503))
                if 1 <= cfg.max_retries:
                    pending[lc] = (d1, 1, wave + 1)
                else:
                    res.dead.append((lc, _host_of(lc), d1, 1, wave))
                continue
            _ts, _url, html, _text, _lang = entry
            wave_bytes += len(html) if html is not None else 0
            rt2, _t2, links2 = process_html(html, lc, hook_pats)
            if rt2 is not None:
                res.fetched.append((lc, wave, 302))
                lc2 = canonicalize_url_py(rt2)
                if lc2 is not None:
                    discover(lc2, d1 + 1, lc)
            else:
                res.fetched.append((lc, wave, 200))
                for link in links2:
                    lc2 = canonicalize_url_py(link)
                    if lc2 is not None:
                        discover(lc2, d1 + 1, lc)

        res.wave_totals.append((wave, fetch_count, wave_bytes))

        # 6. spend tokens: emitting hosts store (available - n) with a
        # fresh stamp; idle hosts keep their stamp (closed-form spec)
        for h, n in emitted_by_host.items():
            st = host_state[h]
            if st["delay"] > 0:
                st["tokens"] = avail[h] - n
            st["wave_updated"] = wave
            st["budget"] += n

        # 7. frontier merge: (remaining ∪ discoveries) ∖ seen, min-key dedup
        nxt: dict[str, tuple] = dict(remaining)
        for lc, cand in discoveries.items():
            prev = nxt.get(lc)
            if prev is None or cand < prev:
                nxt[lc] = cand
        frontier = {c: v for c, v in nxt.items() if c not in res.seen}

    res.waves_run = cfg.max_waves
    return res
