"""robots.txt parsing and URL permission evaluation — pure Catalyst.

Clean-room from the PUBLIC spec (RFC 9309, Robots Exclusion Protocol):
group structure (consecutive ``User-agent`` lines open a group whose
``Allow``/``Disallow`` rules follow), case-insensitive directives,
``#`` comments, empty ``Disallow:`` meaning allow-all, longest-match
precedence with Allow beating Disallow on ties, and a specific
user-agent group overriding the ``*`` group entirely. Wildcard path
patterns (RFC 9309 §2.2.3's ``*`` = any char sequence and trailing
``$`` = end-of-path anchor, a MAY the major crawlers all implement) are
supported: a wildcard rule is compiled — inside Catalyst, at rule
width — to an anchored regex (specials escaped, ``*`` → ``.*``), and
precedence uses the raw pattern's octet length (the reference behavior
of Google's public robotstxt matcher, which RFC 9309 codified).
Wildcard-free rules keep the plain ``startswith`` fast path: per-row
regex compilation touches only the rare wildcard rules' candidates,
never the whole URL table.

Scale notes: the parsed rule table has a handful of rows per HOST —
tiny next to a 10^12-row URL table — so evaluation broadcasts the rules
and the URL side never shuffles; the final argmax is a groupBy(url)
with map-side partial aggregation. Parsing itself is an explode over
lines with one small per-host window to assign group ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DIRECTIVE_RE = r"^\s*([A-Za-z-]+)\s*:"
_VALUE_RE = r"^\s*[A-Za-z-]+\s*:\s*([^#\s]*)"


def parse_robots(df: DataFrame, host_col: str = "host",
                 content_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → (host, grp, agent, directive, prefix): one
    row per (agent × rule) pairing within each group."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n"))
        .alias("ln", "line"))
    d = F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1))
    v = F.regexp_extract("line", _VALUE_RE, 1)
    # Drop blank/comment/unparseable lines (no directive) BEFORE group
    # detection: RFC 9309's ABNF allows empty lines BETWEEN the
    # User-agent lines of one group ("User-agent: a\n\nUser-agent: b\n
    # Disallow: /x" is ONE two-agent group), so only parseable lines may
    # affect the lag-based group starts below.
    lines = (lines.select("host", "ln", d.alias("d"), v.alias("v"))
             .where(F.col("d") != ""))
    is_ua = F.col("d") == "user-agent"
    w = Window.partitionBy("host").orderBy("ln")
    # a User-agent line PRECEDED BY a non-User-agent line starts a group
    # (consecutive UA lines share the group they open together)
    starts = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    lines = lines.withColumn(
        "grp", F.sum(starts.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = (lines.where(is_ua)
              .select("host", "grp", F.lower("v").alias("agent")))
    rules = (lines.where(F.col("d").isin("allow", "disallow")
                         & (F.col("v") != ""))  # empty Disallow: allow-all
             .select("host", "grp", F.col("d").alias("directive"),
                     F.col("v").alias("prefix")))
    # LEFT join: a group whose only rule is an empty ``Disallow:`` (the
    # explicit allow-all form) must SURVIVE as a rule-less row — RFC 9309
    # group selection happens before rule matching, so a specific agent's
    # empty group overrides the * group rather than vanishing from the
    # table (its row carries null directive/prefix).
    return agents.join(rules, ["host", "grp"], "left")


def evaluate(urls: DataFrame, rules: DataFrame, agent: str,
             host_col: str = "host", path_col: str = "path") -> DataFrame:
    """Per URL: allowed under RFC 9309 precedence? Adds ``allowed``
    (boolean; no matching rule → True) and ``matched_rule``. The rule
    table is broadcast; a host with a group for ``agent`` uses ONLY that
    group's rules, else the ``*`` group."""
    me = agent.lower()
    r = rules.where(F.col("agent").isin(me, "*"))
    specific = (r.groupBy("host")
                .agg(F.max((F.col("agent") == me).cast("int"))
                     .alias("_has_me")))
    r = (r.join(specific, "host")
         .where((F.col("agent") == me) |
                ((F.col("_has_me") == 0) & (F.col("agent") == "*")))
         .select("host", "directive", "prefix"))
    # Compile wildcard rules (``*`` anywhere / trailing ``$``) to anchored
    # regexes ONCE at rule width — the rule table is per-host-tiny, so the
    # regexp_replace chain below is free; the URL side only ever evaluates
    # the compiled column. Wildcard-free rules skip regex entirely.
    has_wild = (F.col("prefix").contains("*") |
                F.col("prefix").endswith("$"))
    anchored = F.col("prefix").endswith("$")
    core = F.when(anchored, F.expr(
        "substring(prefix, 1, length(prefix) - 1)")).otherwise(
        F.col("prefix"))
    esc = F.regexp_replace(  # escape regex specials EXCEPT the * wildcard
        core, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1")
    rx = F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    r = r.withColumn("_rx", F.when(has_wild, rx))
    u = urls.select(F.col(host_col).alias("host"),
                    F.col(path_col).alias("path"))
    # null prefix rows survive the match filter: they are either "host has
    # no robots" (left-join miss) or "selected group allows everything"
    # (empty-Disallow group) — both resolve to the default allow below
    cand = (u.join(F.broadcast(r), "host", "left")
            .where(F.col("prefix").isNull() |
                   F.when(F.col("_rx").isNotNull(),
                          F.regexp_like("path", F.col("_rx")))
                   .otherwise(F.col("path").startswith(F.col("prefix")))))
    best = (cand.groupBy("host", "path").agg(
        F.max(F.when(F.col("prefix").isNotNull(), F.struct(
            F.length("prefix").alias("l"),
            (F.col("directive") == "allow").alias("is_allow"),
            F.col("prefix").alias("p")))).alias("_best")))
    return (u.distinct().join(best, ["host", "path"], "left")
            .select("host", "path",
                    F.coalesce(F.col("_best.is_allow"), F.lit(True))
                    .alias("allowed"),
                    F.coalesce(F.col("_best.p"), F.lit(""))
                    .alias("matched_rule")))


def sitemap_urls(df: DataFrame, host_col: str = "host",
                 content_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` directive extraction: (host, ln, sitemap_url), one
    row per Sitemap line in document order. Per the sitemaps.org
    protocol (and RFC 9309's "other records" rule) the directive is
    GLOBAL — independent of any User-agent group — so this is a plain
    line explode + filter, no group window. The value regex stops at
    whitespace/``#`` (URLs never contain either), so trailing comments
    are dropped. Feeds :func:`tuatara_spark.ops.frontier.parse_sitemaps`
    with the per-host sitemap fetch list."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n"))
        .alias("ln", "line"))
    d = F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1))
    v = F.regexp_extract("line", _VALUE_RE, 1)
    return (lines.select("host", "ln", d.alias("d"),
                         v.alias("sitemap_url"))
            .where((F.col("d") == "sitemap") & (F.col("sitemap_url") != ""))
            .drop("d"))


def crawl_delays(df: DataFrame, host_col: str = "host",
                 content_col: str = "robots_txt") -> DataFrame:
    """``Crawl-delay`` extraction: (host, agent, crawl_delay_ms). The
    directive is not in RFC 9309 but is the de-facto standard all major
    non-Google crawlers honor; like Allow/Disallow it is GROUP-scoped,
    so this reuses the same blank-line-tolerant group detection as
    :func:`parse_robots`. Seconds values may be fractional ("0.5") —
    parsed as DECIMAL and scaled to integer milliseconds so downstream
    scheduling (ops/frontier.py schedule delay_ms) and the value-hash
    oracle stay float-free. Unparseable values drop the row (never fail
    the task); several Crawl-delay lines in one group keep the LAST
    (max ln), matching last-writer-wins parser behavior."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n"))
        .alias("ln", "line"))
    d = F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1))
    v = F.regexp_extract("line", _VALUE_RE, 1)
    lines = (lines.select("host", "ln", d.alias("d"), v.alias("v"))
             .where(F.col("d") != ""))
    is_ua = F.col("d") == "user-agent"
    w = Window.partitionBy("host").orderBy("ln")
    starts = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    lines = lines.withColumn(
        "grp", F.sum(starts.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = (lines.where(is_ua)
              .select("host", "grp", F.lower("v").alias("agent")))
    delays = (lines.where(F.col("d") == "crawl-delay")
              .withColumn("_ms", (F.expr(
                  "try_cast(v AS decimal(12,3))") * 1000).cast("long"))
              .where(F.col("_ms").isNotNull() & (F.col("_ms") >= 0))
              .groupBy("host", "grp")
              .agg(F.max_by("_ms", "ln").alias("crawl_delay_ms")))
    return agents.join(delays, ["host", "grp"]).drop("grp")


def meta_robots_gate(df: DataFrame, id_col: str = "doc_id",
                     meta_col: str = "meta_robots",
                     header_col: str = "x_robots_tag") -> DataFrame:
    """Page-level robots directive gate — the indexing decision from
    the ``<meta name="robots">`` content attribute and the
    ``X-Robots-Tag`` response header (the public Google/Bing REP
    extension documented alongside RFC 9309: both carry the same
    comma-separated token list; the header and the meta tag combine
    restrictively).

    Tokens are lowercased, comma-split, trimmed. ``none`` means
    ``noindex, nofollow``. A page can be indexed unless any source
    says noindex/none, followed unless any says nofollow/none; and
    ``noarchive`` is surfaced since corpus builders honor it.

    → (id_col, can_index, can_follow, noarchive).

    Scale shape: shuffle-free codegen projection.
    """
    both = F.expr(
        f"transform(split(concat_ws(',', lower({meta_col}), "
        f"lower({header_col})), ','), x -> trim(x))")
    has = (lambda tok:
           F.array_contains(both, tok) | F.array_contains(both, "none"))
    return df.select(
        F.col(id_col),
        (~has("noindex")).alias("can_index"),
        (~has("nofollow")).alias("can_follow"),
        F.array_contains(both, "noarchive").alias("noarchive"))
