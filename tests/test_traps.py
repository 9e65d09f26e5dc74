"""operators/traps.py — URL-template collapse and crawl-trap flags:
template formula vectors, aggregation counts, the two-condition flag
(population AND host share), and the JVM-only plan gate."""

from pyspark.sql import functions as F

from webcrawl_spark.operators.traps import (
    template_stats,
    trap_templates,
    url_template,
)


class TestTemplate:
    CASES = [
        ("https://a.com/blog/2024/01/post-12", "/blog/{n}/{n}/post-{n}"),
        ("https://a.com/u/deadbeef01234567/x", "/u/{hex}/x"),
        # digit run inside a longer hex run: hex collapse wins (and the
        # hex class is greedy through trailing a-f letters)
        ("https://a.com/t/12345678abc", "/t/{hex}"),
        ("https://a.com/t/12345678xyz", "/t/{hex}xyz"),
        # short hex (<8) is NOT collapsed; digits inside it still are
        ("https://a.com/t/ab12cd", "/t/ab{n}cd"),
        ("https://a.com/?page=9", "/"),
        ("https://a.com", "/"),
        ("https://a.com/cal?y=2024&m=1", "/cal"),
        ("https://a.com/p#frag9", "/p"),
    ]

    def test_vectors(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES],
                                   "url string")
        got = [r["t"] for r in
               df.select(url_template(F.col("url")).alias("t")).collect()]
        assert got == [t for _, t in self.CASES]

    def test_pure_column_plan(self, spark):
        """No python UDF, no shuffle: the template must inline into
        whole-stage codegen in the scan stage."""
        df = spark.createDataFrame([("https://a.com/1",)], "url string")
        plan = df.select(url_template(F.col("url")).alias("t")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


def _urls(spark):
    rows = (
        [(f"https://trap.com/cal/{y}/{m}",) for y in range(2020, 2024)
         for m in range(1, 13)]                      # 48 urls, one template
        + [(f"https://trap.com/about",)]
        + [(f"https://clean.com/p{i}/doc",) for i in range(30)]  # spread? no
        + [(f"https://clean.com/about",), ("https://clean.com/faq",),
           ("https://clean.com/contact",)]
    )
    return spark.createDataFrame(rows, "url string")


class TestStatsAndFlags:
    def test_template_counts(self, spark):
        got = {(r["host"], r["template"]): r["n_urls"]
               for r in template_stats(_urls(spark)).collect()}
        assert got[("trap.com", "/cal/{n}/{n}")] == 48
        assert got[("clean.com", "/p{n}/doc")] == 30

    def test_trap_needs_population_and_share(self, spark):
        flags = {(r["host"], r["template"]): r["is_trap"]
                 for r in trap_templates(_urls(spark), min_urls=40,
                                         min_share=0.5).collect()}
        assert flags[("trap.com", "/cal/{n}/{n}")] is True
        # clean.com's biggest template dominates share-wise (30/33) but
        # misses the population floor
        assert flags[("clean.com", "/p{n}/doc")] is False
        # trap.com's /about misses both
        assert flags[("trap.com", "/about")] is False

    def test_share_is_host_relative(self, spark):
        row = [r for r in trap_templates(_urls(spark), min_urls=40)
               .collect() if r["template"] == "/cal/{n}/{n}"][0]
        assert row["host_urls"] == 49
        assert abs(row["share"] - 48 / 49) < 1e-12

    def test_existing_host_col_reused(self, spark):
        df = _urls(spark).withColumn(
            "h", F.regexp_extract(F.col("url"), "://([^/]*)", 1))
        a = sorted(map(tuple, template_stats(df, host_col="h").collect()))
        b = sorted(map(tuple, template_stats(df).collect()))
        assert a == b


class TestFilterTrapped:
    def test_anti_join_and_plan(self, spark):
        from webcrawl_spark.operators.traps import filter_trapped

        urls = _urls(spark)
        traps = trap_templates(urls, min_urls=40, min_share=0.5)
        kept = filter_trapped(urls, traps)
        assert kept.columns == ["url"]
        got = {r["url"] for r in kept.collect()}
        assert not any("/cal/" in u for u in got)
        assert "https://trap.com/about" in got
        assert all("clean.com" in u or "trap.com" in u for u in got)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
