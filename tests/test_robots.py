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
