"""robots.txt politeness — SURVEY.md §2A op 7, §2C ops 17–18.

The reference caches robots.txt per host and enforces crawl-delay via
its scheduler (BASELINE.json: "robots.txt cache + crawl-delay token
bucket"; checkout empty, SURVEY.md §0).  Here:

* robots bodies are rows of the pages corpus (``/robots.txt`` path);
  parsing is a scalar pandas UDF → a small ``host_state`` dimension
  that is **broadcast** into every politeness join (hosts ≪ URLs).
* allow/deny is most-specific-match-wins over allow/disallow rule
  paths (Google semantics, ties → allow), including RFC 9309 §2.2.3
  ``*`` wildcards and trailing ``$`` end anchors (r4); per-host rule
  lists are tiny, so the match runs vectorized in a pandas UDF after
  the broadcast join.
* the token bucket is pure column arithmetic (Catalyst), one update
  per wave — see config.py for the pinned discretization.

Parse spec (pinned; oracle simulator mirrors it):
  lines split on '\n'; ``field: value`` with field case-insensitive;
  groups per RFC 9309 — consecutive ``User-agent`` lines open a group
  whose rules apply to all the named agents.  Group selection for
  agent A: token ``*`` matches with specificity 0; token t matches if
  lower(t) is a prefix of lower(A) (product-token match), specificity
  len(t).  The highest-specificity matching groups win (so a specific
  ``User-agent: shaman`` group OVERRIDES ``*`` — r1 honored only the
  ``*`` group, VERDICT item 6); equal-specificity groups merge.
  ``Disallow:``/``Allow:`` with empty value are ignored; ``Crawl-delay``
  parsed as float (invalid → ignored; absent → default).  A missing/
  unfetchable robots.txt or no matching group → allow-all, default
  delay.
"""

from __future__ import annotations

import functools as _functools

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("rules", ArrayType(
            StructType([
                StructField("allow", BooleanType()),
                StructField("prefix", StringType()),
            ])
        )),
        StructField("crawl_delay", DoubleType()),
    ]
)


# --- pure-Python kernels (shared spec with the oracle simulator) ------------

def parse_robots(body: str | None, default_delay: float = 0.0,
                 user_agent: str = "*"):
    """robots.txt body → (rules, crawl_delay); see parse spec above.

    *user_agent* is the crawler's product token; the most specific
    matching group(s) win (RFC 9309 §2.2.1), ``*`` being least specific.
    """
    if not body:
        return [], default_delay
    # 1. parse into groups: ([tokens], [(allow, prefix)], delay|None)
    groups: list[tuple[list, list, float | None]] = []
    cur_tokens: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_agent_run = False  # consecutive User-agent lines share a group

    def _flush():
        nonlocal cur_tokens, cur_rules, cur_delay
        if cur_tokens:
            groups.append((cur_tokens, cur_rules, cur_delay))
        cur_tokens, cur_rules, cur_delay = [], [], None

    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                _flush()
            cur_tokens.append(value)
            in_agent_run = True
        else:
            in_agent_run = False
            if field == "disallow" and value:
                cur_rules.append((False, value))
            elif field == "allow" and value:
                cur_rules.append((True, value))
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    _flush()

    # 2. pick the highest-specificity matching group(s)
    ua = user_agent.lower()

    def _spec(token: str) -> int:
        if token == "*":
            return 0
        t = token.lower()
        return len(t) if ua.startswith(t) else -1

    best = -1
    for tokens, _, _ in groups:
        for t in tokens:
            best = max(best, _spec(t))
    if best < 0:
        return [], default_delay
    rules: list[tuple[bool, str]] = []
    delay = default_delay
    for tokens, rs, dl in groups:
        if max((_spec(t) for t in tokens), default=-1) == best:
            rules.extend(rs)
            if dl is not None:
                delay = dl
    return rules, delay


@_functools.lru_cache(maxsize=4096)
def _rule_regex(pattern: str):
    """Compiled matcher for a rule path containing ``*`` / trailing
    ``$`` (RFC 9309 §2.2.3) — None for plain prefixes (fast path)."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    import re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


def _rule_matches(path: str, pattern: str) -> bool:
    rx = _rule_regex(pattern)
    if rx is None:
        return path.startswith(pattern)
    return rx.match(path) is not None


def robots_allowed(path: str, rules) -> bool:
    """Most-specific-match-wins over rule paths; tie → allow; no match
    → allow.  Rule paths support RFC 9309 §2.2.3 special characters:
    ``*`` matches any character sequence, a trailing ``$`` anchors the
    match at the end of the path.  Specificity = rule-path octet
    length (the RFC's rule); plain prefixes behave exactly as before
    (byte-identical to the pre-wildcard kernel, goldens unchanged).
    """
    best_len = -1
    best_allow = True
    for allow, prefix in rules:
        if _rule_matches(path, prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = bool(allow)
    return best_allow


def url_path_of(url_canon: str) -> str:
    """Path+query of a canonical URL (rules match on path per RFC 9309)."""
    rest = url_canon.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


# --- Spark surface ----------------------------------------------------------

def build_host_state(
    pages: DataFrame, hosts: DataFrame, default_delay: float = 0.0,
    user_agent: str = "*",
) -> DataFrame:
    """host dimension: robots rules + crawl_delay for every host in *hosts*.

    *pages* needs (url_canon, host, html); robots rows are
    ``{scheme}://{host}/robots.txt``.  Output: (host, rules,
    crawl_delay) with allow-all defaults for robots-less hosts.
    The caller broadcasts this into politeness joins.
    """
    from pyspark.sql import Window

    if "url" in pages.columns:
        # r6 (guide §6 — make the predicate reach the scan): the exact
        # filter below tests the COMPUTED url_canon, so the scan would
        # otherwise evaluate the canonicalization expression on every
        # corpus row just to find the handful of robots pages.  A
        # canonical URL equal to scheme://host/robots.txt preserves its
        # raw path bytes, so the raw url must contain the literal
        # "/robots.txt" — a pushdown-friendly superset prefilter on a
        # source column; the exact predicate then runs on the survivors
        # only.  Results are identical (strict superset).
        pages = pages.filter(F.col("url").contains("/robots.txt"))
    robots_rows = pages.filter(
        F.col("url_canon").endswith("/robots.txt")
        & (
            F.col("url_canon")
            == F.concat(
                F.split_part(F.col("url_canon"), F.lit("://"), F.lit(1)),
                F.lit("://"), F.col("host"), F.lit("/robots.txt"),
            )
        )
    ).select("host", "url_canon", "html")
    # one robots row per host: if both http and https robots exist,
    # prefer the lexicographically-first canonical URL (http) —
    # deterministic, and prevents a duplicated host dimension
    w = Window.partitionBy("host").orderBy(F.col("url_canon").asc())
    robots_rows = (
        robots_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("host", "html")
    )

    @F.pandas_udf(ROBOTS_SCHEMA)
    def parse_udf(html: pd.Series) -> pd.DataFrame:
        from shaman_scraping_spark.functions.html import decode_html

        out_rules, out_delay = [], []
        for b in html:
            rules, delay = parse_robots(decode_html(b), default_delay,
                                        user_agent)
            out_rules.append([
                {"allow": a, "prefix": p} for a, p in rules
            ])
            out_delay.append(delay)
        return pd.DataFrame({"rules": out_rules, "crawl_delay": out_delay})

    parsed = robots_rows.withColumn("rb", parse_udf(F.col("html"))).select(
        "host", F.col("rb.rules").alias("rules"),
        F.col("rb.crawl_delay").alias("crawl_delay"),
    )
    return (
        hosts.select("host").distinct()
        .join(parsed, "host", "left")
        .select(
            "host",
            F.coalesce(F.col("rules"), F.array()).alias("rules"),
            F.coalesce(F.col("crawl_delay"), F.lit(default_delay)).alias(
                "crawl_delay"
            ),
        )
    )


@F.pandas_udf(BooleanType())
def robots_allowed_udf(path: pd.Series, rules: pd.Series) -> pd.Series:
    out = []
    for p, rl in zip(path, rules):
        if rl is None or len(rl) == 0:
            out.append(True)
            continue
        out.append(robots_allowed(p, [(r["allow"], r["prefix"]) for r in rl]))
    return pd.Series(out, dtype=bool)


def apply_robots_filter(frontier: DataFrame, host_state: DataFrame) -> DataFrame:
    """Stamp ``allowed:boolean`` per frontier row (op 18).

    host_state is broadcast (small dim); the prefix match is the one
    place a pandas UDF runs in the scheduling path — rule lists don't
    form a clean theta-join.
    """
    with_rules = frontier.join(
        F.broadcast(host_state.select("host", "rules")), "host", "left"
    )
    # path+query = everything from the first '/' after the authority
    # (canonical URLs always have a path, so locate() never returns 0;
    # handles non-default ports, matching url_path_of exactly)
    path = F.expr(
        "substring(url_canon,"
        " locate('/', url_canon, length(split_part(url_canon, '://', 1)) + 4))"
    )
    return with_rules.withColumn(
        "allowed", robots_allowed_udf(path, F.col("rules"))
    ).drop("rules")


def refill_tokens(
    host_state: DataFrame, wave_seconds: float, bucket_cap: float,
    unlimited_quota: int, waves=1,
) -> DataFrame:
    """Token-bucket refill + integer quota (op 17; pure Catalyst).

    tokens' = min(cap, tokens + waves * wave_seconds/delay)  (delay > 0)
    quota   = floor(tokens')        delay == 0 → unlimited

    *waves* — refill periods to apply: an int, or a per-row Column of
    wave gaps (the closed-form lazy refill the delta state layout
    uses, config.py wave-clock spec).  Saturating min makes the closed
    form equal the iterated per-wave refill; the multiply-once
    arithmetic (gap * (wave_seconds / delay)) is the pinned spec, so
    every implementation — here, the snapshot layout, the sequential
    simulator — rounds identically.
    """
    gap = waves if isinstance(waves, Column) else F.lit(waves)
    tokens = F.when(
        F.col("crawl_delay") > 0,
        F.least(
            F.lit(float(bucket_cap)),
            F.col("tokens")
            + gap.cast("double")
            * (F.lit(float(wave_seconds)) / F.col("crawl_delay")),
        ),
    ).otherwise(F.lit(float(bucket_cap)))
    quota = F.when(
        F.col("crawl_delay") > 0, F.floor(F.col("tokens"))
    ).otherwise(F.lit(unlimited_quota))
    return host_state.withColumn("tokens", tokens).withColumn("quota", quota)


def spend_tokens(host_state: DataFrame, emitted: DataFrame) -> DataFrame:
    """tokens -= emitted_count; budget_used += emitted_count.

    *emitted*: (host, emitted_count) from this wave's scheduled set.
    """
    return (
        host_state.join(F.broadcast(emitted), "host", "left")
        .withColumn(
            "tokens",
            F.when(
                F.col("crawl_delay") > 0,
                F.col("tokens") - F.coalesce(F.col("emitted_count"), F.lit(0)),
            ).otherwise(F.col("tokens")),
        )
        .withColumn(
            "budget_used",
            F.col("budget_used") + F.coalesce(F.col("emitted_count"), F.lit(0)),
        )
        .drop("emitted_count")
    )
