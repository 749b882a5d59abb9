"""robots.txt parsing + evaluation: RFC 9309 grouping, precedence,
agent override, comments/case edge cases, plan shape."""

from pyspark.sql import functions as F

from tuatara_spark.ops import robots as R

ROBOTS = """\
# top comment
User-agent: Googlebot
User-agent: tuatara
Disallow: /shared/
Allow: /shared/ok/

USER-AGENT: *
disallow: /all/
Disallow:
Allow: /all/except   # trailing comment
"""


def _eval(spark, paths, agent, robots=ROBOTS, host="h"):
    hosts = spark.createDataFrame([(host, robots)],
                                  "host string, robots_txt string")
    urls = spark.createDataFrame([(host, p) for p in paths],
                                 "host string, path string")
    rules = R.parse_robots(hosts)
    out = R.evaluate(urls, rules, agent=agent)
    return {r.path: (r.allowed, r.matched_rule) for r in out.collect()}


def test_grouping_and_multi_agent_lines(spark):
    got = _eval(spark, ["/shared/x", "/shared/ok/x", "/all/x", "/other"],
                agent="tuatara")
    # tuatara shares Googlebot's group; the * group is IGNORED entirely
    assert got["/shared/x"] == (False, "/shared/")
    assert got["/shared/ok/x"] == (True, "/shared/ok/")   # longer allow
    assert got["/all/x"] == (True, "")                    # * rules unused
    assert got["/other"] == (True, "")


def test_star_group_when_no_specific(spark):
    got = _eval(spark, ["/all/x", "/all/except/y", "/shared/x"],
                agent="randombot")
    assert got["/all/x"] == (False, "/all/")
    assert got["/all/except/y"] == (True, "/all/except")
    assert got["/shared/x"] == (True, "")   # specific group not ours
    # directives parse case-insensitively (USER-AGENT / disallow above)


def test_allow_wins_exact_tie(spark):
    robots = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    got = _eval(spark, ["/p/x"], agent="any", robots=robots)
    assert got["/p/x"] == (True, "/p/")


def test_empty_disallow_is_allow_all(spark):
    robots = "User-agent: *\nDisallow:\n"
    got = _eval(spark, ["/anything"], agent="any", robots=robots)
    assert got["/anything"] == (True, "")


def test_host_without_robots_defaults_allow(spark):
    hosts = spark.createDataFrame([("h1", "User-agent: *\nDisallow: /\n")],
                                  "host string, robots_txt string")
    urls = spark.createDataFrame([("h1", "/x"), ("h2", "/x")],
                                 "host string, path string")
    out = {(r.host): r.allowed for r in
           R.evaluate(urls, R.parse_robots(hosts), "bot").collect()}
    assert out == {"h1": False, "h2": True}


def test_rules_join_is_broadcast_and_jvm_only(spark):
    hosts = spark.createDataFrame([("h", ROBOTS)],
                                  "host string, robots_txt string")
    urls = spark.createDataFrame([("h", "/x")], "host string, path string")
    plan = R.evaluate(urls, R.parse_robots(hosts), "tuatara") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower(), plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


def test_specific_allow_all_group_overrides_star(spark):
    # RFC 9309: group SELECTION precedes rule matching — a specific
    # agent's group whose only rule is the empty (allow-all) Disallow
    # must win over a deny-all * group, not vanish from the rule table
    robots = ("User-agent: tuatara\nDisallow:\n\n"
              "User-agent: *\nDisallow: /\n")
    got = _eval(spark, ["/x", "/"], agent="tuatara", robots=robots)
    assert got["/x"] == (True, "") and got["/"] == (True, "")
    # other agents still get the deny-all * group
    got2 = _eval(spark, ["/x"], agent="otherbot", robots=robots)
    assert got2["/x"] == (False, "/")


def test_blank_and_comment_lines_inside_group(spark):
    # RFC 9309 ABNF allows empty lines BETWEEN the User-agent lines of a
    # single group: both agents here share the one Disallow rule.
    robots = ("User-agent: alpha\n\n"
              "# interleaved comment\n"
              "User-agent: beta\n"
              "Disallow: /x\n")
    for agent in ("alpha", "beta"):
        got = _eval(spark, ["/x/page", "/y"], agent=agent, robots=robots)
        assert got["/x/page"] == (False, "/x"), agent
        assert got["/y"] == (True, "")


def test_wildcard_star_matches_any_span(spark):
    # RFC 9309 §2.2.3: '*' matches any sequence of characters incl. '/'
    robots = ("User-agent: *\n"
              "Disallow: /private*\n"
              "Allow: /private/public*\n")
    got = _eval(spark, ["/private", "/privateer", "/private/a/b",
                        "/private/public/x", "/pub"],
                agent="any", robots=robots)
    assert got["/private"] == (False, "/private*")
    assert got["/privateer"] == (False, "/private*")
    assert got["/private/a/b"] == (False, "/private*")
    # longer raw pattern wins: the Allow overrides inside /private/public
    assert got["/private/public/x"] == (True, "/private/public*")
    assert got["/pub"] == (True, "")


def test_wildcard_dollar_anchors_end(spark):
    robots = "User-agent: *\nDisallow: /*.pdf$\n"
    got = _eval(spark, ["/a/b.pdf", "/a/b.pdfx", "/b.pdf/c", "/x.PDF"],
                agent="any", robots=robots)
    assert got["/a/b.pdf"] == (False, "/*.pdf$")
    assert got["/a/b.pdfx"] == (True, "")   # $ anchors: no partial match
    assert got["/b.pdf/c"] == (True, "")
    assert got["/x.PDF"] == (True, "")      # path matching is case-sensitive


def test_wildcard_specials_are_literal(spark):
    # regex metacharacters in a robots pattern are LITERAL path bytes —
    # the compiler must escape them ('.' must not match any char, '+'
    # must not quantify)
    robots = "User-agent: *\nDisallow: /a.b+c*\n"
    got = _eval(spark, ["/a.b+c/d", "/aXbbc/d"], agent="any", robots=robots)
    assert got["/a.b+c/d"] == (False, "/a.b+c*")
    assert got["/aXbbc/d"] == (True, "")


def test_wildcard_vs_prefix_precedence_by_pattern_length(spark):
    # precedence compares RAW pattern octet lengths (the public
    # robotstxt-matcher behavior RFC 9309 codified): '/p/deny-me' (10)
    # beats '/p/*' (4) even though both match
    robots = ("User-agent: *\n"
              "Allow: /p/*\n"
              "Disallow: /p/deny-me\n")
    got = _eval(spark, ["/p/deny-me/x", "/p/other"], agent="any",
                robots=robots)
    assert got["/p/deny-me/x"] == (False, "/p/deny-me")
    assert got["/p/other"] == (True, "/p/*")


def test_wildcard_free_rules_keep_startswith_semantics(spark):
    # a lone '*' rule matches everything, incl. the empty path suffix
    robots = "User-agent: *\nDisallow: *\nAllow: /ok/\n"
    got = _eval(spark, ["/anything", "/ok/x"], agent="any", robots=robots)
    assert got["/anything"] == (False, "*")
    assert got["/ok/x"] == (True, "/ok/")


def test_sitemap_urls_global_and_comment_stripped(spark):
    from tuatara_spark.ops import robots as R
    txt = ("# hi\nSitemap: https://a/s.xml\nUser-agent: x\n"
           "Disallow: /p\nsitemap: https://a/t.xml # mirror\n"
           "Sitemap:\n")  # empty value → no row
    df = spark.createDataFrame([("a", txt)], "host string, robots_txt string")
    got = [(r.ln, r.sitemap_url) for r in
           R.sitemap_urls(df).orderBy("ln").collect()]
    # case-insensitive directive, group-independent, comment dropped
    assert got == [(1, "https://a/s.xml"), (4, "https://a/t.xml")]


def test_crawl_delays_groups_fractions_and_bad_values(spark):
    from tuatara_spark.ops import robots as R
    txt = ("User-agent: a\nCrawl-delay: 2\nCrawl-delay: 0.25\n"
           "User-agent: b\n\nUser-agent: c\nCrawl-delay: 1.5\n"
           "User-agent: d\nCrawl-delay: nope\n"
           "User-agent: e\nCrawl-delay: -1\n")
    df = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    got = {r.agent: r.crawl_delay_ms for r in R.crawl_delays(df).collect()}
    # last-writer wins in a's group; b+c share a blank-line-split group;
    # unparseable (d) and negative (e) values drop the row
    assert got == {"a": 250, "b": 1500, "c": 1500}
