"""robots.txt parsing + URL filtering: group semantics (star groups only,
consecutive User-agent headers, comments, empty Disallow), prefix matching
on the parsed path, corpus-side plan shape."""

from pyspark.sql import functions as F

from minhashsketch_spark.operators.robots import (
    disallow_rules,
    filter_robots_disallowed,
    robots_compliance,
)

ROBOTS = """# policy file
User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /private
Disallow:
Disallow: /tmp/

User-agent: weirdbot
User-agent: *
Disallow: /shared
"""


def _robots_df(spark):
    return spark.createDataFrame([("A.example.com", ROBOTS)],
                                 "domain string, robots_txt string")


def test_disallow_rules_star_groups_only(spark):
    rules = {(r["host"], r["prefix"])
             for r in disallow_rules(_robots_df(spark)).collect()}
    # googlebot-only rule excluded; empty Disallow excluded; the
    # two-header group counts because one of its UAs is *
    assert rules == {("a.example.com", "/private"),
                     ("a.example.com", "/tmp/"),
                     ("a.example.com", "/shared")}


def test_compliance_and_filter(spark):
    docs = spark.createDataFrame([
        (1, "https://a.example.com/private/x"),
        (2, "https://a.example.com/public/x"),
        (3, "https://A.EXAMPLE.com/shared?q=1"),      # host case, query cut
        (4, "https://other.example.com/private/x"),   # no rules for host
        (5, "https://a.example.com/google-only/x"),   # non-star group
        (6, "https://a.example.com/tmp/f#frag"),      # fragment cut
    ], "doc_id bigint, url string")
    robots = _robots_df(spark)
    verdict = {r["doc_id"]: r["robots_disallowed"]
               for r in robots_compliance(docs, robots).collect()}
    assert verdict == {1: True, 2: False, 3: True, 4: False, 5: False,
                       6: True}
    kept = {r["doc_id"] for r in
            filter_robots_disallowed(docs, robots).collect()}
    assert kept == {2, 4, 5}


def test_corpus_never_shuffles_for_robots(spark):
    """The rules dim must broadcast; no hashpartitioning of the corpus."""
    docs = spark.range(0, 500).selectExpr(
        "id AS doc_id", "concat('https://a.example.com/p/', id) AS url")
    plan = filter_robots_disallowed(docs, _robots_df(spark)) \
        ._sc._jvm.PythonSQLUtils.explainString(
        filter_robots_disallowed(docs, _robots_df(spark))
        ._jdf.queryExecution(), "formatted")
    assert "Broadcast" in plan
    import re

    # only the tiny robots side may hash-partition (its parse windows)
    for m in re.findall(r"hashpartitioning\((\w+)", plan):
        assert m.startswith("host"), plan
