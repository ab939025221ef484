"""REP longest-prefix-match URL admission (operators/robots.py)."""

from __future__ import annotations


def _run(spark, urls, rules):
    from med_doi_feature_extraction_spark.operators.robots import (
        apply_robots,
    )

    u = spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], "id long, url string"
    )
    r = spark.createDataFrame(
        rules, "host string, rule string, path_prefix string"
    )
    return {
        r_["id"]: (
            r_["robots_type"],
            r_["robots_prefix"],
            r_["robots_allowed"],
        )
        for r_ in apply_robots(u, r, "url", id_cols=["id"]).collect()
    }


class TestApplyRobots:
    def test_longest_match_wins(self, spark):
        got = _run(
            spark,
            ["https://a.com/cat/7/x"],
            [
                ("a.com", "disallow", "/cat/"),
                ("a.com", "allow", "/cat/7/"),
            ],
        )
        assert got[0] == ("allow", "/cat/7/", 1)

    def test_allow_wins_equal_length_tie(self, spark):
        got = _run(
            spark,
            ["https://a.com/abc"],
            [
                ("a.com", "disallow", "/ab"),
                ("a.com", "allow", "/ab"),
            ],
        )
        assert got[0] == ("allow", "/ab", 1)

    def test_unlisted_host_and_no_match_are_allowed(self, spark):
        got = _run(
            spark,
            ["https://other.com/x", "https://a.com/zzz"],
            [("a.com", "disallow", "/cat/")],
        )
        assert got[0] == (None, None, 1)
        assert got[1] == (None, None, 1)

    def test_bare_host_gets_root_path(self, spark):
        got = _run(
            spark,
            ["https://a.com", "https://a.com/"],
            [("a.com", "disallow", "/")],
        )
        assert got[0][2] == 0 and got[1][2] == 0

    def test_host_normalization_port_case_userinfo(self, spark):
        got = _run(
            spark,
            [
                "HTTPS://A.com:443/p",
                "http://user@a.com:80/p",
            ],
            [("a.com", "disallow", "/p")],
        )
        assert got[0][2] == 0 and got[1][2] == 0

    def test_query_string_not_part_of_path(self, spark):
        got = _run(
            spark,
            ["https://a.com/p?q=/cat/"],
            [("a.com", "disallow", "/cat/")],
        )
        assert got[0] == (None, None, 1)

    def test_disallow_all_with_carve_out(self, spark):
        urls = [
            "https://a.com/public/doc",
            "https://a.com/private/doc",
        ]
        rules = [
            ("a.com", "disallow", "/"),
            ("a.com", "allow", "/public/"),
        ]
        got = _run(spark, urls, rules)
        assert got[0][2] == 1 and got[1][2] == 0
