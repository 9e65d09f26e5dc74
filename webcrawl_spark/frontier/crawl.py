"""SparkCrawl — the crawl frontier + fetch scheduler as round-scheduled
DataFrame jobs (SURVEY.md §3.1 "Spark re-expression", BASELINE.json north
rule).

Each scheduling round is ONE DataFrame job:

  frontier queued rows
    → per-host top-k under the politeness budget  (Window.partitionBy(host))
    → global FIFO cap                              (ordered limit)
    → synthetic fetch                              (join pages on url)
    → extraction (markdown byte-identical)         (Arrow UDFs)
    → link expansion L2 + admission F1             (posexplode + classify UDF)
    → seen-set dedup                               (Bloom shard probe →
                                                    exact left anti-join)
    → seq assignment                               (range-partitioned
                                                    zipWithIndex — no single-
                                                    task global sort)
    → append frontier/fetch_log/crawl_result/metrics + merged Bloom shards
    → atomic round commit (checkpoint)             (TableIO)

Scale posture:
- The frontier is partitioned by host_bucket = xxhash64(host) % B so one
  host's URLs co-locate (politeness windows and shard probes shuffle only
  within buckets); hot hosts are bounded by the budget top-k which AQE's
  skew-join handling backs up.
- The seen-set anti-join is pre-filtered by per-bucket Bloom shards
  (frontier/bloom.py) so certainly-new candidates skip the shuffle join.
- The `html` binary column is never shuffled: extraction projects it out
  before link expansion (project early, join late — SURVEY.md §4).

Ordering contract (W1): fetch order must equal the in-memory oracle
(frontier/oracle.py round_crawl; ≡ the reference's BFS FIFO when budget is
None). Dedup key is configurable: "url" reproduces the reference's exact-
string discovered-set; "url_canon" is the north-rule canonicalized mode.

The reference's global `limit` (≤10k, types.ts:86) retains its sequential
cross-page admission semantics via a driver-side replay over the (small,
limit-bounded) per-round candidate set; unlimited crawls (the 10^10 path)
use the fully distributed admission pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import CLASSIFY_SCHEMA, canonicalize_url, url_depth
from ..kernels.classify import classify_link, _build_robot, _compile_patterns
from ..kernels.crawl import page_links
from ..kernels.scrape import markdown_for_page
from ..kernels import urlkit
from ..sources.tableio import TableIO
from .bloom import BloomShard, bits_for, merge_blobs, optimal_k
from .oracle import CrawlConfig

__all__ = ["SparkCrawl", "EngineConfig"]

TABLES = ["frontier", "fetch_log", "crawl_result", "round_metrics",
          "bucket_metrics", "seen_shards"]


class EngineConfig:
    """Engine-level knobs layered over the semantic CrawlConfig."""

    def __init__(
        self,
        num_buckets: int = 32,
        dedup_key: str = "url",           # "url" (reference parity) | "url_canon"
        use_bloom: bool = True,
        bloom_keys_per_shard: int = 100_000,
        bloom_fp_rate: float = 0.01,
        max_rounds: int = 1000,
    ) -> None:
        self.num_buckets = num_buckets
        self.dedup_key = dedup_key
        self.use_bloom = use_bloom
        self.bloom_keys_per_shard = bloom_keys_per_shard
        self.bloom_fp_rate = bloom_fp_rate
        self.max_rounds = max_rounds


def _crawl_links_udf(cfg: CrawlConfig):
    """(html_text, url) → array<string> — L2 (kernels/crawl.py)."""
    opts = cfg.filter_options()

    def batch(htmls: pd.Series, urls: pd.Series) -> pd.Series:
        out = []
        for html, url in zip(htmls, urls):
            if html and html.strip().startswith("<"):
                try:
                    out.append(page_links(html, url, opts))
                except Exception:
                    out.append([])
            else:
                out.append([])
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.ArrayType(T.StringType()))


def _classify_f1_udf(cfg: CrawlConfig):
    """F1 predicate chain without limit (link) → struct."""
    opts = cfg.filter_options()

    def batch(links: pd.Series) -> pd.DataFrame:
        base = urlkit.parse_url(opts.base_url)
        initial = urlkit.parse_url(opts.initial_url)
        excludes = _compile_patterns(opts.excludes)
        includes = _compile_patterns(opts.includes)
        robot = _build_robot(opts)
        rows = [
            classify_link(link or "", opts, _base=base, _initial=initial,
                          _excludes=excludes, _includes=includes, _robot=robot)
            for link in links
        ]
        return pd.DataFrame(rows, columns=["allowed", "url", "denial_reason"])

    return pandas_udf(batch, CLASSIFY_SCHEMA)


def _markdown_udf():
    def batch(htmls: pd.Series, urls: pd.Series) -> pd.Series:
        out = []
        for html, url in zip(htmls, urls):
            if not html:
                out.append("")
                continue
            try:
                out.append(markdown_for_page(html, url))
            except Exception:
                out.append("")
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.StringType())


def _assign_dense_seq(df: DataFrame, order_cols: list[str], start: int) -> DataFrame:
    """Dense global sequence without a single-task global sort: range-
    partition by the order columns, sort within partitions, then
    zipWithIndex (a count-then-offset two-pass — each task only scans its
    own partition)."""
    n_parts = max(1, min(df.sparkSession.sparkContext.defaultParallelism,
                         32))
    ordered = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols]) \
                .sortWithinPartitions(*order_cols)
    schema = ordered.schema.add("seq", T.LongType())
    rdd = ordered.rdd.zipWithIndex().map(
        lambda pair: (*pair[0], start + pair[1])
    )
    return df.sparkSession.createDataFrame(rdd, schema)


class SparkCrawl:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        cfg: CrawlConfig,
        workdir: str,
        engine: EngineConfig | None = None,
    ) -> None:
        self.spark = spark
        self.pages = pages
        self.cfg = cfg
        self.engine = engine or EngineConfig()
        self.io = TableIO(spark, workdir)

    # --- public API ------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> int:
        """Run/resume to completion; returns the number of rounds executed
        in this invocation."""
        self.io.rollback_uncommitted(TABLES)
        executed = 0
        limit = max_rounds if max_rounds is not None else self.engine.max_rounds
        if self.io.committed_round() < 0:
            self._seed_round()
            executed += 1
        while executed < limit:
            if not self._run_round():
                break
            executed += 1
        return executed

    def fetch_log(self) -> DataFrame:
        return self.io.read("fetch_log")

    def frontier(self) -> DataFrame:
        return self.io.read("frontier")

    def results(self) -> DataFrame:
        return self.io.read("crawl_result")

    def metrics(self) -> DataFrame:
        return self.io.read("round_metrics")

    def fetch_order(self) -> list[str]:
        """Materialized successful-fetch sequence (ordering-contract probe;
        matches oracle CrawlTrace.fetch_order, which excludes fetch errors)."""
        return [
            r["url"]
            for r in self.fetch_log().filter(F.col("status") == 200)
            .orderBy("seq").select("url").collect()
        ]

    # --- internals -------------------------------------------------------
    def _host_col(self, url_col):
        from ..functions import url_host
        return url_host(url_col)

    def _frontier_row_df(self, rows: list[tuple], start_round: int) -> DataFrame:
        schema = (
            "url string, url_canon string, host string, host_bucket int, "
            "depth int, priority int, round_discovered int, seq long"
        )
        return self.spark.createDataFrame(rows, schema)

    def _seed_round(self) -> None:
        """Round 0 bootstrap: frontier := {seed}."""
        cfg, eng = self.cfg, self.engine
        canon = urlkit.canonicalize_url(cfg.seed_url)
        host = urlkit.url_host(cfg.seed_url)
        depth = urlkit.get_url_depth(urlkit.url_path(cfg.seed_url))
        seed_df = self._frontier_row_df(
            [(cfg.seed_url, canon, host, 0, depth, 0, 0, 0)], 0
        ).withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("host"), F.lit(eng.num_buckets)).cast("int"),
        )
        self.io.append(seed_df, "frontier", 0, partition_by=["host_bucket"])
        if eng.use_bloom:
            self._append_shards(seed_df, 0)
        self.io.commit_round(0, processed=0, next_seq=1, done=False)

    def _dedup_col(self) -> str:
        return "url" if self.engine.dedup_key == "url" else "url_canon"

    def _append_shards(self, new_frontier: DataFrame, round_no: int) -> None:
        """Build per-bucket Bloom shards from this round's new URLs (grouped
        map = the distributed build; merge happens at probe time)."""
        eng = self.engine
        dedup = self._dedup_col()
        m_bits = bits_for(eng.bloom_keys_per_shard, eng.bloom_fp_rate)
        k = optimal_k(m_bits, eng.bloom_keys_per_shard)

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np
            shard = BloomShard(m_bits, k)
            shard.add(pdf["dedup_hash"].to_numpy().astype(np.uint64))
            return pd.DataFrame({
                "host_bucket": [int(pdf["host_bucket"].iloc[0])],
                "blob": [shard.to_bytes()],
            })

        shards = (
            new_frontier
            .withColumn("dedup_hash", F.xxhash64(F.col(dedup)))
            .withColumn(
                "host_bucket",
                F.pmod(F.xxhash64("host"), F.lit(eng.num_buckets)).cast("int"),
            )
            .groupBy("host_bucket")
            .applyInPandas(build, "host_bucket int, blob binary")
        )
        self.io.append(shards, "seen_shards", round_no)

    def _load_shards(self) -> dict[int, BloomShard]:
        """treeAggregate-style merge of committed shards, small enough to
        broadcast locally (per-bucket cogroup join is the cluster-scale
        alternative; seam kept narrow on purpose)."""
        try:
            rows = self.io.read("seen_shards").groupBy("host_bucket").agg(
                F.collect_list("blob").alias("blobs")
            ).collect()
        except FileNotFoundError:
            return {}
        return {
            r["host_bucket"]: BloomShard.from_bytes(merge_blobs(r["blobs"]))
            for r in rows
        }

    def _run_round(self) -> bool:
        cfg, eng, io = self.cfg, self.engine, self.io
        prev_round = io.committed_round()
        meta = io.checkpoint_meta()
        if meta.get("done"):
            return False
        round_no = prev_round + 1
        processed = int(meta.get("processed", 0))
        next_seq = int(meta.get("next_seq", 1))
        limit = cfg.limit

        frontier = io.read("frontier")
        try:
            fetched_log = io.read("fetch_log")
            queued = frontier.join(
                fetched_log.select("seq").withColumnRenamed("seq", "fseq"),
                frontier["seq"] == F.col("fseq"), "left_anti",
            )
        except FileNotFoundError:
            queued = frontier

        # ---- selection: per-host budget top-k, then global FIFO cap ----
        if cfg.host_budget is not None:
            w = Window.partitionBy("host").orderBy("priority", "seq")
            queued = (
                queued.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= cfg.host_budget).drop("_rn")
            )
        if limit is not None:
            remaining_fetches = limit - processed
            if remaining_fetches <= 0:
                io.commit_round(round_no, processed=processed,
                                next_seq=next_seq, done=True)
                return False
            selected = queued.orderBy("priority", "seq").limit(remaining_fetches)
        else:
            selected = queued
        selected = selected.cache()
        n_selected = selected.count()
        if n_selected == 0:
            io.commit_round(round_no, processed=processed,
                            next_seq=next_seq, done=True)
            return False

        # ---- synthetic fetch: join pages on exact url ----
        pages = self.pages.select(
            F.col("url").alias("page_url"), F.col("html"),
        )
        fetched = (
            selected.join(pages, selected["url"] == pages["page_url"], "left")
            .drop("page_url")
            .withColumn(
                "html_text",
                F.when(F.col("html").isNotNull(),
                       F.decode(F.col("html"), "UTF-8")),
            )
            .withColumn("status",
                        F.when(F.col("html").isNotNull(), 200).otherwise(404))
            .drop("html")
        ).cache()

        # ---- extraction (the byte-identical surface) ----
        result = fetched.select(
            "url", "url_canon", "host", "depth", "seq", "status",
            _markdown_udf()(F.col("html_text"), F.col("url")).alias("markdown"),
        ).withColumn("round", F.lit(round_no))
        io.append(result, "crawl_result", round_no)

        log_df = fetched.select(
            "url", "url_canon", "host", "depth", "priority", "seq", "status",
        ).withColumn("round", F.lit(round_no))
        io.append(log_df, "fetch_log", round_no)

        # ---- link expansion (L2) + admission (F1) ----
        base_depth = cfg.base_depth()
        expandable = fetched.filter(
            (F.col("status") == 200)
            & (F.greatest(url_depth(F.col("url")) - F.lit(base_depth), F.lit(0))
               < F.lit(cfg.max_depth))
        )
        cand = (
            expandable
            .select(
                F.col("seq").alias("source_seq"),
                F.posexplode(_crawl_links_udf(cfg)(F.col("html_text"),
                                                   F.col("url")))
                .alias("link_pos", "link"),
            )
        )
        cls = cand.withColumn("c", _classify_f1_udf(cfg)(F.col("link")))
        denial_stats = (
            cls.filter(~F.col("c.allowed"))
            .groupBy(F.col("c.denial_reason").alias("denial_reason")).count()
        )
        allowed = (
            cls.filter(F.col("c.allowed"))
            .select("source_seq", "link_pos", "link")
            .withColumn("url_canon", canonicalize_url(F.col("link")))
        )
        dedup = self._dedup_col()
        dedup_col = F.col("link") if dedup == "url" else F.col("url_canon")
        allowed = allowed.withColumn("dedup_key", dedup_col) \
                         .withColumn("dedup_hash", F.xxhash64("dedup_key"))

        # ---- seen-set check: Bloom probe → exact anti-join ----
        frontier_keys = frontier.select(
            F.xxhash64(F.col(dedup)).alias("seen_hash"),
            F.col(dedup).alias("seen_key"),
        )
        if eng.use_bloom:
            shards = self._load_shards()
            num_buckets = eng.num_buckets
            bc = self.spark.sparkContext.broadcast(
                {b: s.to_bytes() for b, s in shards.items()}
            )

            # bucket computed JVM-side for consistency with shard build
            allowed = allowed.withColumn(
                "host_bucket",
                F.pmod(F.xxhash64(self._host_col(F.col("link"))),
                       F.lit(num_buckets)).cast("int"),
            )

            @pandas_udf(T.BooleanType())
            def probe(hashes: pd.Series, buckets: pd.Series) -> pd.Series:
                import numpy as np
                blobs = bc.value
                h = hashes.to_numpy().astype(np.uint64)
                b = buckets.to_numpy()
                out = np.ones(len(h), dtype=bool)  # unknown bucket → maybe
                for bucket in np.unique(b):
                    mask = b == bucket
                    blob = blobs.get(int(bucket))
                    if blob is None:
                        out[mask] = False  # no shard yet → definitely new
                    else:
                        shard = BloomShard.from_bytes(blob)
                        out[mask] = shard.contains(h[mask])
                return pd.Series(out)

            allowed = allowed.withColumn(
                "maybe_seen", probe(F.col("dedup_hash"), F.col("host_bucket"))
            )
            surely_new = allowed.filter(~F.col("maybe_seen")) \
                                .withColumn("is_seen", F.lit(False))
            to_check = allowed.filter(F.col("maybe_seen"))
            checked = to_check.join(
                frontier_keys.withColumn("is_seen_j", F.lit(True)),
                to_check["dedup_key"] == frontier_keys["seen_key"], "left",
            ).withColumn(
                "is_seen", F.coalesce(F.col("is_seen_j"), F.lit(False))
            ).select(*surely_new.columns)
            flagged = surely_new.unionByName(checked)
        else:
            flagged = allowed.join(
                frontier_keys.withColumn("is_seen_j", F.lit(True)).drop("seen_hash"),
                allowed["dedup_key"] == F.col("seen_key"), "left",
            ).withColumn(
                "is_seen", F.coalesce(F.col("is_seen_j"), F.lit(False))
            ).drop("is_seen_j", "seen_key")

        # ---- admission ----
        if limit is not None:
            admitted_df = self._admit_with_limit_replay(
                flagged, frontier, limit, round_no
            )
        else:
            new_only = flagged.filter(~F.col("is_seen"))
            w_first = Window.partitionBy("dedup_key").orderBy(
                "source_seq", "link_pos"
            )
            admitted_df = (
                new_only.withColumn("_rn", F.row_number().over(w_first))
                .filter(F.col("_rn") == 1).drop("_rn")
                .select("source_seq", "link_pos", "link", "url_canon")
            )

        # ---- frontier append with dense seq ----
        new_rows = admitted_df.select(
            F.col("link").alias("url"),
            F.col("url_canon"),
            self._host_col(F.col("link")).alias("host"),
            F.pmod(F.xxhash64(self._host_col(F.col("link"))),
                   F.lit(eng.num_buckets)).cast("int").alias("host_bucket"),
            url_depth(F.col("link")).alias("depth"),
            F.lit(0).alias("priority"),
            F.lit(round_no).alias("round_discovered"),
            F.col("source_seq"), F.col("link_pos"),
        )
        with_seq = _assign_dense_seq(
            new_rows, ["source_seq", "link_pos"], next_seq
        ).drop("source_seq", "link_pos")
        with_seq = with_seq.cache()
        n_new = with_seq.count()
        io.append(with_seq, "frontier", round_no, partition_by=["host_bucket"])
        if eng.use_bloom and n_new:
            self._append_shards(with_seq, round_no)

        # ---- per-round metrics + lineage ----
        denials = {r["denial_reason"]: r["count"] for r in denial_stats.collect()}
        metrics_rows = [(
            round_no, n_selected, n_new, processed + n_selected,
            str(denials),
        )]
        metrics_df = self.spark.createDataFrame(
            metrics_rows,
            "round int, fetched long, new_urls long, processed long, denials string",
        )
        io.append(metrics_df, "round_metrics", round_no)
        bucket_metrics = (
            with_seq.groupBy("host_bucket").count()
            .withColumn("round", F.lit(round_no))
        )
        io.append(bucket_metrics, "bucket_metrics", round_no)

        io.commit_round(
            round_no,
            processed=processed + n_selected,
            next_seq=next_seq + n_new,
            done=False,
        )
        selected.unpersist()
        fetched.unpersist()
        with_seq.unpersist()
        return True

    def _admit_with_limit_replay(
        self, flagged: DataFrame, frontier: DataFrame, limit: int,
        round_no: int,
    ) -> DataFrame:
        """Sequential cross-page admission semantics (crawlService.ts:57-66 +
        crawler.rs:267-269): per source page in seq order, accepted links
        (dups included) consume the per-page ``remaining`` budget; only
        unseen ones join the frontier. The candidate set is bounded by the
        API page limit (≤10k), so the replay is a small driver computation.
        """
        discovered_count = frontier.count()
        rows = (
            flagged.select("source_seq", "link_pos", "link", "url_canon",
                           "dedup_key", "is_seen")
            .orderBy("source_seq", "link_pos").collect()
        )
        admitted: list[tuple] = []
        round_new: set[str] = set()
        total = discovered_count
        cur_seq = None
        acc = 0
        remaining = limit - total
        for r in rows:
            if r["source_seq"] != cur_seq:
                cur_seq = r["source_seq"]
                remaining = limit - total
                acc = 0
            if remaining <= 0 or acc >= remaining:
                continue
            acc += 1
            if not r["is_seen"] and r["dedup_key"] not in round_new:
                round_new.add(r["dedup_key"])
                admitted.append(
                    (r["source_seq"], r["link_pos"], r["link"], r["url_canon"])
                )
                total += 1
        if not admitted:
            return self.spark.createDataFrame(
                [], "source_seq long, link_pos int, link string, url_canon string"
            )
        return self.spark.createDataFrame(
            admitted, "source_seq long, link_pos int, link string, url_canon string"
        )
