"""FetchCache (the conditional-GET validator cache, J5's live twin):
latest-wins snapshots, selection-bounded probe, validator-less rows
skipped. The end-to-end 304 behavior is covered by
test_frontier.py::test_conditional_fetch_recrawl_serves_from_cache."""


def _cache(spark, tmp_path):
    from webcrawl_spark.sources.fetchcache import FetchCache

    return FetchCache(spark, str(tmp_path / "fc"))


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, etag string, last_modified string, html binary")


def test_empty_cache_returns_none(spark, tmp_path):
    fc = _cache(spark, tmp_path)
    assert fc.snapshot() is None
    sel = spark.createDataFrame([("u",)], "url string")
    assert fc.probe(sel) is None


def test_latest_wins_and_validatorless_skipped(spark, tmp_path):
    fc = _cache(spark, tmp_path)
    fc.record(_df(spark, [
        ("u1", "e1", None, bytearray(b"v1")),
        ("u2", None, "lm", bytearray(b"v2")),
        ("u3", None, None, bytearray(b"dropme")),   # no validators
    ]))
    fc.record(_df(spark, [("u1", "e1b", None, bytearray(b"v1b"))]))

    snap = {r["url"]: (r["etag"], bytes(r["html"]))
            for r in fc.snapshot().collect()}
    assert snap == {"u1": ("e1b", b"v1b"), "u2": (None, b"v2")}

    sel = spark.createDataFrame([("u1",), ("u3",), ("u9",)], "url string")
    probed = {r["url"]: bytes(r["html"]) for r in fc.probe(sel).collect()}
    assert probed == {"u1": b"v1b"}


def test_probe_never_shuffles_cache(spark, tmp_path):
    """The round-path read joins the cache against the BROADCAST selection
    — the cache side must not exchange before the join."""
    fc = _cache(spark, tmp_path)
    fc.record(_df(spark, [(f"u{i}", f"e{i}", None, bytearray(b"x"))
                          for i in range(50)]))
    sel = spark.createDataFrame([("u1",), ("u2",)], "url string")
    plan = fc.probe(sel)._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
