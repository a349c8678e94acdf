"""URL/domain filtering (operators/urlfilter.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.urlfilter import (
    domain_suffixes,
    extract_domain,
    filter_domains,
    filter_url_patterns,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "http://good.org/page"),
            (2, "https://user:pw@Spam.COM:8080/x?q=1"),
            (3, "http://a.b.spam.com/deep"),
            (4, "http://notspam.com/x"),  # NOT a subdomain of spam.com
            (5, "ftp://files.bad.net/f.zip"),
            (6, "relative/path/only"),  # host = 'relative' — no match
            (7, None),
        ],
        "doc_id long, url string",
    )


def test_extract_domain(spark):
    got = [
        r["d"]
        for r in _docs(spark).select(extract_domain("url").alias("d")).collect()
    ]
    assert got == [
        "good.org", "spam.com", "a.b.spam.com", "notspam.com",
        "files.bad.net", "relative", None,
    ]


def test_suffix_chain(spark):
    row = (
        spark.range(1)
        .select(domain_suffixes(F.lit("a.b.spam.com")).alias("s"))
        .first()
    )
    assert row["s"] == ["a.b.spam.com", "b.spam.com", "spam.com", "com"]


@pytest.mark.parametrize("as_df", [False, True])
def test_block_matches_subdomains_not_lookalikes(spark, as_df):
    doms = ["SPAM.com", "bad.net"]
    if as_df:
        doms = spark.createDataFrame([(d,) for d in doms], "domain string")
    kept = sorted(
        r["doc_id"] for r in filter_domains(_docs(spark), doms).collect()
    )
    # 2 (case/port/userinfo), 3 (subdomain), 5 (subdomain of bad.net)
    # blocked; 4 is a lookalike, 6/7 have no matchable host
    assert kept == [1, 4, 6, 7]


def test_allow_mode(spark):
    kept = sorted(
        r["doc_id"]
        for r in filter_domains(
            _docs(spark), ["spam.com"], mode="allow"
        ).collect()
    )
    assert kept == [2, 3]


def test_large_list_path_matches_inline_path(spark):
    import data_governance_spark.operators.urlfilter as U

    doms = ["spam.com", "bad.net"] + [f"filler{i}.zz" for i in range(20)]
    inline = sorted(
        r["doc_id"] for r in filter_domains(_docs(spark), doms).collect()
    )
    old = U._INLINE_MAX
    U._INLINE_MAX = 1  # force the explode/semi-join tier
    try:
        big = sorted(
            r["doc_id"] for r in filter_domains(_docs(spark), doms).collect()
        )
    finally:
        U._INLINE_MAX = old
    assert inline == big == [1, 4, 6, 7]


def test_url_patterns(spark):
    kept = sorted(
        r["doc_id"]
        for r in filter_url_patterns(
            _docs(spark), [r"\.zip$", r"\?q="]
        ).collect()
    )
    assert kept == [1, 3, 4, 6, 7]  # 2 (query) and 5 (.zip) dropped


def test_empty_patterns_noop(spark):
    assert filter_url_patterns(_docs(spark), []).count() == 7


def test_inline_path_is_shuffle_free(spark):
    plan = (
        filter_domains(_docs(spark), ["spam.com"])
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in plan  # literal-array tier: pure filter


def test_patterns_property_combined_equals_sequential(spark):
    """Documented contract: for patterns WITHOUT numbered
    backreferences, one combined alternation == applying each pattern
    sequentially. Randomized over a pool of realistic URL regexes."""
    rng = random.Random(20260814)
    pool = [
        r"\.zip$", r"\.exe$", r"\?q=", r"//m\.", r"\d{4}/\d{2}",
        r"^ftp://", r"[&?]utm_", r"/(tag|category)/", r"\.onion/",
        r"(?i)TRACKER",
    ]
    hosts = ["a.org", "b.com", "m.b.com", "c.net"]
    paths = [
        "/x.zip", "/y.exe", "/p?q=1", "/2024/07/post", "/tag/t",
        "/plain", "/?utm_src=1", "/TrAcKeR", "",
    ]
    urls = [
        (i, f"{rng.choice(['http', 'ftp'])}://{rng.choice(hosts)}{rng.choice(paths)}")
        for i in range(60)
    ] + [(999, None)]
    docs = spark.createDataFrame(urls, "doc_id long, url string")
    for _ in range(5):
        pats = rng.sample(pool, rng.randrange(1, 5))
        combined = sorted(
            r["doc_id"] for r in filter_url_patterns(docs, pats).collect()
        )
        seq = docs
        for p in pats:
            seq = filter_url_patterns(seq, [p])
        sequential = sorted(r["doc_id"] for r in seq.collect())
        assert combined == sequential, pats


class TestCanonicalUrl:
    def test_rules(self, spark):
        from data_governance_spark.operators.urlfilter import canonical_url

        cases = {
            # scheme/host case + default port + fragment + tracking +
            # param sort
            "HTTPS://Example.COM:443/p/x?utm_source=a&b=2&a=1#f":
                "https://example.com/p/x?a=1&b=2",
            # empty path -> "/"
            "http://EX.com": "http://ex.com/",
            # non-default port kept; whole-query tracking -> dropped
            "http://ex.com:8080/a?gclid=xyz": "http://ex.com:8080/a",
            # path case SIGNIFICANT; fbclid dropped; sort is bytewise
            "https://ex.com/P?z=2&y=1&fbclid=1": "https://ex.com/P?y=1&z=2",
            # bare '?' drops; :80 default for http drops
            "http://ex.com:80/?": "http://ex.com/",
            # unparseable passes through unchanged
            "not a url": "not a url",
            # utm_ is a PREFIX family
            "http://e.com/?utm_x_y=1&keep=2": "http://e.com/?keep=2",
            # a param NAMED like a tracking value but not matching stays
            "http://e.com/?gclid2=1": "http://e.com/?gclid2=1",
        }
        df = spark.createDataFrame(
            [(k,) for k in cases], "u string"
        )
        got = {
            r["u"]: r["c"]
            for r in df.select(
                "u", canonical_url("u").alias("c")
            ).collect()
        }
        for inp, want in cases.items():
            assert got[inp] == want, inp

    def test_null_and_idempotent(self, spark):
        from data_governance_spark.operators.urlfilter import canonical_url

        urls = [
            "HTTPS://A.COM:443/x?utm_a=1&b=2#z",
            "http://b.org:81/p?q=1",
            None,
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        once = df.select(canonical_url("u").alias("u"))
        twice = once.select(canonical_url("u").alias("u"))
        assert [r["u"] for r in once.collect()] == [
            r["u"] for r in twice.collect()
        ]
        assert once.collect()[2]["u"] is None

    def test_plan_is_codegen_no_shuffle(self, spark):
        from data_governance_spark.operators.urlfilter import canonical_url

        df = spark.range(10).selectExpr(
            "concat('http://h', id, '.com/p?b=2&a=', id) AS u"
        )
        plan = df.select(canonical_url("u"))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # zero Python in the plan


class TestCanonicalUserinfo:
    def test_userinfo_survives_verbatim(self, spark):
        from data_governance_spark.operators.urlfilter import canonical_url

        cases = {
            "HTTP://Alice@Example.COM:80/x": "http://Alice@example.com/x",
            "https://u:p@h.com/a?utm_x=1": "https://u:p@h.com/a",
            "http://h.com/plain": "http://h.com/plain",
        }
        df = spark.createDataFrame([(k,) for k in cases], "u string")
        got = {r["u"]: r["c"] for r in df.select(
            "u", canonical_url("u").alias("c")).collect()}
        for inp, want in cases.items():
            assert got[inp] == want, inp
