"""SparkCrawl — the crawl frontier + fetch scheduler as round-scheduled
DataFrame jobs (SURVEY.md §3.1 "Spark re-expression", BASELINE.json north
rule).

Each scheduling round is ONE DataFrame job:

  queued frontier rows
    → per-host top-k under the politeness budget  (Window.partitionBy(host))
    → global FIFO cap                              (ordered limit)
    → synthetic fetch                              (join pages on url)
    → extraction (markdown byte-identical)         (Arrow UDFs)
    → link expansion L2 + admission F1             (posexplode + classify UDF)
    → seen-set dedup                               (Bloom shard probe →
                                                    exact left anti-join)
    → seq assignment                               (driver-side for small /
                                                    limit rounds; range-
                                                    partitioned zipWithIndex
                                                    for big rounds)
    → append frontier + crawl_result (fetch_log is a columnar projection
      of crawl_result) + driver-side JSON round metrics
    → atomic round commit (checkpoint)             (TableIO)

State model: the frontier and fetched-seq sets live in memory as lists of
per-round pinned (localCheckpoint) parts; the cumulative union is a lazy
narrow plan, compacted when the list grows. Bloom shards are
driver-resident and rebuilt from the committed frontier on resume. The
per-round appends + the atomic commit marker ARE the checkpoint: a crash
mid-round loses nothing (uncommitted files are rolled back and the round
re-runs deterministically).

Scale posture:
- frontier partitioned by host_bucket = xxhash64(host) % B so one host's
  URLs co-locate (politeness windows and shard probes shuffle within
  buckets); AQE skew handling backs up the explicit budget top-k.
- the seen-set anti-join is pre-filtered by per-bucket Bloom shards
  (frontier/bloom.py): certainly-new candidates skip the shuffle join.
- the `html` binary column never enters a shuffle (project early).
- the reference's global `limit` (≤10k, types.ts:86) keeps its sequential
  cross-page admission semantics via a driver-side replay over the (small,
  limit-bounded) candidate set; unlimited crawls (the 10^10 path) use the
  fully distributed admission pipeline.

Ordering contract (W1): fetch order equals the in-memory oracle
(frontier/oracle.py round_crawl; ≡ the reference BFS FIFO when budget is
None). Dedup key configurable: "url" = reference exact-string discovered
set; "url_canon" = north-rule canonicalized mode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import CLASSIFY_SCHEMA, canonicalize_url, url_depth, url_host
from ..kernels.classify import classify_link, _build_robot, _compile_patterns
from ..kernels.crawl import page_links
from ..kernels.scrape import markdown_for_page
from ..kernels import urlkit
from ..sources.tableio import TableIO
from .bloom import BloomShard, bits_for, optimal_k
from .oracle import CrawlConfig

__all__ = ["SparkCrawl", "EngineConfig"]

# fetch_log is a projection of crawl_result (columnar reads prune the
# markdown column away); bloom shards are rebuilt from the frontier table on
# resume rather than persisted per round.
TABLES = ["frontier", "crawl_result", "round_metrics", "host_budget"]

FRONTIER_SCHEMA = (
    "url string, url_canon string, host string, host_bucket int, "
    "depth int, priority int, round_discovered int, seq long"
)


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
        extract_markdown: bool = True,
        small_round_threshold: int = 5000,
    ) -> None:
        self.num_buckets = num_buckets
        self.dedup_key = dedup_key
        self.use_bloom = use_bloom
        self.bloom_keys_per_shard = bloom_keys_per_shard
        self.bloom_fp_rate = bloom_fp_rate
        self.max_rounds = max_rounds
        self.extract_markdown = extract_markdown
        # rounds with fewer fetches than this use the driver-side admission
        # path even without a limit (identical result, none of the
        # distributed-dedup fixed cost); big rounds stay fully distributed
        self.small_round_threshold = small_round_threshold


def _crawl_links_udf(cfg: CrawlConfig):
    """(html binary, url) → array<string> — L2 (kernels/crawl.py); decodes
    in Python (U5), skipping JVM string materialization."""
    opts = cfg.filter_options()

    def batch(htmls: pd.Series, urls: pd.Series) -> pd.Series:
        from ..functions import _as_text
        out = []
        for html, url in zip(htmls, urls):
            text = _as_text(html)
            if text and text.strip().startswith("<"):
                try:
                    out.append(page_links(text, url, opts))
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
        from ..functions import _as_text
        out = []
        for html, url in zip(htmls, urls):
            text = _as_text(html)
            if not text:
                out.append("")
                continue
            try:
                out.append(markdown_for_page(text, url))
            except Exception:
                out.append("")
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.StringType())


def _assign_dense_seq(df: DataFrame, order_cols: list[str], start: int) -> DataFrame:
    """Dense global sequence without a single-task global sort: range-
    partition by the order columns, sort within partitions, then
    zipWithIndex (count-then-offset two-pass; each task scans only its own
    partition)."""
    n_parts = max(1, min(df.sparkSession.sparkContext.defaultParallelism, 32))
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
        # in-memory round state (reconstructed on resume). The frontier and
        # fetched-seq sets are kept as lists of per-round PINNED parts; the
        # union is a lazy narrow plan (no per-round pin of the cumulative
        # state — unions over pinned parts cost nothing until used, and the
        # part list is compacted when it grows).
        self._frontier_parts: list[DataFrame] = []
        self._fetched_seq_parts: list[DataFrame] = []
        self._host_tokens: DataFrame | None = None  # (host, tokens) bucket state
        self._shards: dict[int, BloomShard] = {}
        self._processed = 0
        self._next_seq = 1
        self._frontier_count = 0
        self._done = False

    # --- public API ------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> int:
        """Run/resume to completion; returns rounds executed this call."""
        self.io.rollback_uncommitted(TABLES)
        self._load_state()
        executed = 0
        budget_rounds = (max_rounds if max_rounds is not None
                         else self.engine.max_rounds)
        if self.io.committed_round() < 0:
            self._seed_round()
            executed += 1
        while executed < budget_rounds and not self._done:
            if not self._run_round():
                break
            executed += 1
        return executed

    def fetch_log(self) -> DataFrame:
        """Projection of crawl_result (parquet column pruning skips the
        markdown payload entirely)."""
        return self.io.read("crawl_result").select(
            "url", "url_canon", "host", "depth", "priority", "seq", "status",
            "round",
        )

    def frontier(self) -> DataFrame:
        return self.io.read("frontier")

    def results(self) -> DataFrame:
        return self.io.read("crawl_result")

    def metrics(self) -> DataFrame:
        """Per-round metrics + per-bucket lineage (driver-side JSON rows)."""
        records = self.io.read_json("round_metrics")
        rows = [
            (r["round"], r["fetched"], r["new_urls"], r["processed"],
             str(r.get("denials", {})), str(r.get("bucket_new_counts", {})))
            for r in records
        ]
        return self.spark.createDataFrame(
            rows, "round int, fetched long, new_urls long, processed long, "
                  "denials string, bucket_new_counts string",
        )

    def fetch_order(self) -> list[str]:
        """Materialized successful-fetch sequence (ordering-contract probe;
        matches oracle CrawlTrace.fetch_order, which excludes fetch errors)."""
        return [
            r["url"]
            for r in self.fetch_log().filter(F.col("status") == 200)
            .orderBy("round", "priority", "seq").select("url").collect()
        ]

    # --- state -----------------------------------------------------------
    def _pin(self, df: DataFrame) -> DataFrame:
        """Materialize + truncate lineage (rounds must not re-derive).
        localCheckpoint has a ~1s fixed cost per call in local mode but is
        predictable; cache()-based pinning was measured strictly worse
        (lazy-recompute storms through round-local lineage)."""
        return df.localCheckpoint(eager=True)

    def _frontier_df(self) -> DataFrame:
        out = self._frontier_parts[0]
        for part in self._frontier_parts[1:]:
            out = out.unionByName(part)
        return out

    def _queued_df(self) -> DataFrame:
        frontier = self._frontier_df()
        if not self._fetched_seq_parts:
            return frontier
        fetched = self._fetched_seq_parts[0]
        for part in self._fetched_seq_parts[1:]:
            fetched = fetched.unionByName(part)
        return frontier.join(fetched, frontier["seq"] == fetched["fseq"],
                             "left_anti")

    def _compact_parts(self) -> None:
        """Bound plan growth: fold the part lists into one pinned part."""
        if len(self._frontier_parts) > 24:
            self._frontier_parts = [self._pin(self._frontier_df())]
        if len(self._fetched_seq_parts) > 24:
            fetched = self._fetched_seq_parts[0]
            for part in self._fetched_seq_parts[1:]:
                fetched = fetched.unionByName(part)
            self._fetched_seq_parts = [self._pin(fetched)]

    def _load_state(self) -> None:
        committed = self.io.committed_round()
        if committed < 0:
            return
        meta = self.io.checkpoint_meta()
        self._processed = int(meta.get("processed", 0))
        self._next_seq = int(meta.get("next_seq", 1))
        self._done = bool(meta.get("done", False))
        frontier = self._pin(self.io.read("frontier").drop("round"))
        self._frontier_parts = [frontier]
        try:
            fetched = self.io.read("crawl_result").select(
                F.col("seq").alias("fseq"))
            self._fetched_seq_parts = [self._pin(fetched)]
        except FileNotFoundError:
            self._fetched_seq_parts = []
        self._frontier_count = frontier.count()
        if self.engine.use_bloom:
            self._shards = self._rebuild_shards(frontier)
        if self.cfg.budget_capacity is not None:
            try:
                tokens = self.io.read("host_budget")
                latest = tokens.agg(F.max("round")).first()[0]
                self._host_tokens = self._pin(
                    tokens.filter(F.col("round") == latest)
                    .select("host", "tokens"),
                )
            except FileNotFoundError:
                self._host_tokens = None

    def _dedup_col(self) -> str:
        return "url" if self.engine.dedup_key == "url" else "url_canon"

    def _seed_round(self) -> None:
        """Round 0: seed URL first, then sitemap-contributed URLs
        (tryGetSitemap semantics via sources/seeding.py — shared verbatim
        with the oracle, so seeding order matches by construction)."""
        cfg, eng = self.cfg, self.engine
        seeds: list[str] = [cfg.seed_url]
        if cfg.use_sitemap and cfg.sitemaps:
            from ..sources.seeding import sitemap_seed_list

            limit = cfg.limit if cfg.limit is not None else float("inf")
            seen = {cfg.seed_url}
            for url in sitemap_seed_list(cfg.sitemaps.get, cfg):
                if url not in seen and len(seeds) < limit:
                    seen.add(url)
                    seeds.append(url)
        rows = [
            (
                url, urlkit.canonicalize_url(url), urlkit.url_host(url), 0,
                urlkit.get_url_depth(urlkit.url_path(url)),
                cfg.priority_of(url), 0, seq,
            )
            for seq, url in enumerate(seeds)
        ]
        seed_df = self.spark.createDataFrame(rows, FRONTIER_SCHEMA).withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("host"), F.lit(eng.num_buckets)).cast("int"),
        )
        seed_df = self._pin(seed_df)
        self.io.append(seed_df, "frontier", 0, partition_by=["host_bucket"])
        self._frontier_parts = [seed_df]
        self._fetched_seq_parts = []
        self._frontier_count = len(rows)
        self._processed = 0
        self._next_seq = len(rows)
        if eng.use_bloom:
            self._update_shards(seed_df, 0)
        self.io.commit_round(0, processed=0, next_seq=len(rows), done=False)

    def _priority_col(self, depth_col, host_col):
        """north_star priority = depth + host-rank (0 in FIFO mode)."""
        cfg = self.cfg
        if not cfg.priority_mode:
            return F.lit(0)
        rank = F.lit(0)
        if cfg.host_rank:
            mapping = F.create_map(*[
                F.lit(x) for kv in cfg.host_rank.items()
                for x in (kv[0], int(kv[1]))
            ])
            rank = F.coalesce(mapping[host_col].cast("int"), F.lit(0))
        return (depth_col + rank).cast("int")

    def _allowance_upper_bound(self) -> int | None:
        """Largest possible per-host selection this round (None = unlimited
        for some host): bounds the local pre-top-k used for skew control."""
        cfg = self.cfg
        if cfg.host_budget is None and not cfg.host_budget_overrides:
            return None
        candidates = list(cfg.host_budget_overrides.values())
        if cfg.host_budget is not None:
            candidates.append(cfg.host_budget)
        elif cfg.host_budget_overrides:
            return None  # default is unlimited for non-override hosts
        bound = max(candidates)
        if cfg.budget_capacity is not None:
            bound = max(bound, cfg.budget_capacity)
        return int(bound)

    def _refill_col(self):
        """Per-host budget refill as a Column over ``host`` (overrides map →
        default; null = unlimited)."""
        cfg = self.cfg
        base = (F.lit(float(cfg.host_budget)) if cfg.host_budget is not None
                else F.lit(None).cast("double"))
        if cfg.host_budget_overrides:
            mapping = F.create_map(*[
                F.lit(x) for kv in cfg.host_budget_overrides.items()
                for x in (kv[0], float(kv[1]))
            ])
            return F.coalesce(mapping[F.col("host")].cast("double"), base)
        return base

    # --- bloom shards ----------------------------------------------------
    def _shard_params(self) -> tuple[int, int]:
        m = bits_for(self.engine.bloom_keys_per_shard, self.engine.bloom_fp_rate)
        return m, optimal_k(m, self.engine.bloom_keys_per_shard)

    def _update_shards(self, new_frontier: DataFrame, round_no: int) -> None:
        """Update resident shards with this round's keys (driver-resident;
        exact state is the frontier table, so shards rebuild on resume —
        no per-round persistence needed). Also records per-bucket counts
        for the round's bucket lineage metrics."""
        import numpy as np

        dedup = self._dedup_col()
        m_bits, k = self._shard_params()
        rows = (
            new_frontier.select(
                F.col("host_bucket"),
                F.xxhash64(F.col(dedup)).alias("dedup_hash"),
            ).collect()
        )
        per_bucket: dict[int, list[int]] = {}
        for r in rows:
            per_bucket.setdefault(r["host_bucket"], []).append(r["dedup_hash"])
        self._last_bucket_counts = {
            b: len(hs) for b, hs in per_bucket.items()
        }
        for bucket, hashes in per_bucket.items():
            arr = np.array(hashes, dtype=np.int64).astype(np.uint64)
            shard = self._shards.get(bucket)
            if shard is None:
                shard = BloomShard(m_bits, k)
                self._shards[bucket] = shard
            shard.add(arr)

    def _rebuild_shards(self, frontier: DataFrame) -> dict[int, BloomShard]:
        """Resume path: rebuild the per-bucket shards from the committed
        frontier via a grouped-map (the treeAggregate-style distributed
        build), then merge driver-side."""
        import numpy as np

        dedup = self._dedup_col()
        m_bits, k = self._shard_params()

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = BloomShard(m_bits, k)
            shard.add(pdf["dedup_hash"].to_numpy().astype(np.uint64))
            return pd.DataFrame({
                "host_bucket": [int(pdf["host_bucket"].iloc[0])],
                "blob": [shard.to_bytes()],
            })

        rows = (
            frontier.select(
                "host_bucket", F.xxhash64(F.col(dedup)).alias("dedup_hash"))
            .groupBy("host_bucket")
            .applyInPandas(build, "host_bucket int, blob binary")
            .collect()
        )
        return {
            r["host_bucket"]: BloomShard.from_bytes(bytes(r["blob"]))
            for r in rows
        }

    # --- the round job ----------------------------------------------------
    def _run_round(self) -> bool:
        cfg, eng, io = self.cfg, self.engine, self.io
        self._last_bucket_counts = {}
        round_no = io.committed_round() + 1
        limit = cfg.limit
        assert self._frontier_parts

        # ---- selection: per-host budget top-k, then global FIFO cap ----
        queued = self._queued_df()
        use_budget = cfg.host_budget is not None or cfg.host_budget_overrides
        use_bucket = cfg.budget_capacity is not None and use_budget
        avail = None
        if use_bucket:
            # token-bucket: refill hosts with queued work, cap at capacity
            hosts = queued.select("host").distinct()
            prev = (self._host_tokens if self._host_tokens is not None
                    else self.spark.createDataFrame([], "host string, tokens double"))
            avail = (
                hosts.join(prev, "host", "left")
                .withColumn("tokens", F.coalesce(F.col("tokens"), F.lit(0.0)))
                .withColumn(
                    "allowance",
                    F.when(self._refill_col().isNull(),
                           F.lit(None).cast("double"))
                    .otherwise(F.least(F.lit(float(cfg.budget_capacity)),
                                       F.col("tokens") + self._refill_col())),
                )
            )
            avail = self._pin(avail)
        if use_budget:
            if use_bucket:
                queued_a = queued.join(avail.select("host", "allowance"),
                                       "host", "left")
            else:
                queued_a = queued.withColumn("allowance", self._refill_col())
            allowance = F.col("allowance")

            # hot-host skew bound (north rule): before the per-host window
            # shuffle, keep only each host's local top-(cap) rows per input
            # partition — a hot host then ships at most cap × P rows into
            # the shuffle instead of its entire queued backlog.
            cap_bound = self._allowance_upper_bound()
            if cap_bound is not None:
                w_local = Window.partitionBy(
                    F.spark_partition_id(), "host"
                ).orderBy("priority", "seq")
                queued_a = (
                    queued_a.withColumn("_lrn", F.row_number().over(w_local))
                    .filter(allowance.isNull() | (F.col("_lrn") <= cap_bound))
                    .drop("_lrn")
                )

            w = Window.partitionBy("host").orderBy("priority", "seq")
            picked = (
                queued_a.withColumn("_rn", F.row_number().over(w))
                .filter(allowance.isNull() | (F.col("_rn") <= allowance))
                .drop("_rn", "allowance")
            )
        else:
            picked = queued
        if limit is not None:
            remaining_fetches = limit - self._processed
            if remaining_fetches <= 0:
                self._done = True
                io.commit_round(round_no, processed=self._processed,
                                next_seq=self._next_seq, done=True)
                return False
            picked = picked.orderBy("priority", "seq").limit(remaining_fetches)
        selected = self._pin(picked)
        n_selected = selected.count()
        # size-aware narrowing: small rounds don't need 32-way stages (the
        # per-stage python-worker round trip dominates tiny partitions)
        parts = max(1, min(32, n_selected // 64 + 1))
        if parts < selected.rdd.getNumPartitions():
            selected = selected.coalesce(parts)
        if n_selected == 0:
            self._done = True
            io.commit_round(round_no, processed=self._processed,
                            next_seq=self._next_seq, done=True)
            return False

        if use_bucket:
            # consume tokens: new state = allowance - used (finite hosts);
            # hosts without queued work keep their banked tokens untouched
            used = selected.groupBy("host").agg(
                F.count(F.lit(1)).cast("double").alias("used"))
            spent = (
                avail.join(used, "host", "left")
                .withColumn("used", F.coalesce(F.col("used"), F.lit(0.0)))
                .filter(F.col("allowance").isNotNull())
                .select("host",
                        (F.col("allowance") - F.col("used")).alias("tokens"))
            )
            untouched = (
                self._host_tokens.join(queued.select("host").distinct(),
                                       "host", "left_anti")
                if self._host_tokens is not None else
                self.spark.createDataFrame([], "host string, tokens double")
            )
            self._host_tokens = self._pin(spent.unionByName(untouched))
            io.append(self._host_tokens.withColumn("round", F.lit(round_no)),
                      "host_budget", round_no)

        # ---- synthetic fetch (join pages on exact url) + extraction ----
        pages = self.pages.select(F.col("url").alias("page_url"), F.col("html"))
        fetched = (
            selected.join(pages, selected["url"] == pages["page_url"], "left")
            .drop("page_url")
            .withColumn("status",
                        F.when(F.col("html").isNotNull(), 200).otherwise(404))
        )
        fetched = self._pin(fetched)

        result_cols = ["url", "url_canon", "host", "depth", "priority",
                       "seq", "status"]
        if eng.extract_markdown:
            result = fetched.select(
                *result_cols,
                _markdown_udf()(F.col("html"), F.col("url"))
                .alias("markdown"),
            ).withColumn("round", F.lit(round_no))
        else:
            result = fetched.select(*result_cols) \
                .withColumn("round", F.lit(round_no))
        io.append(result, "crawl_result", round_no)

        # ---- link expansion (L2) + admission (F1) ----
        base_depth = cfg.base_depth()
        expandable = fetched.filter(
            (F.col("status") == 200)
            & (F.greatest(url_depth(F.col("url")) - F.lit(base_depth), F.lit(0))
               < F.lit(cfg.max_depth))
        )
        cand = expandable.select(
            F.col("priority").alias("source_priority"),
            F.col("seq").alias("source_seq"),
            F.posexplode(_crawl_links_udf(cfg)(F.col("html"), F.col("url")))
            .alias("link_pos", "link"),
        )
        cls = self._pin(
            cand.withColumn("c", _classify_f1_udf(cfg)(F.col("link")))
        )
        allowed = (
            cls.filter(F.col("c.allowed"))
            .select("source_priority", "source_seq", "link_pos", "link")
            .withColumn("url_canon", canonicalize_url(F.col("link")))
        )
        dedup = self._dedup_col()
        dedup_col = F.col("link") if dedup == "url" else F.col("url_canon")
        allowed = allowed.withColumn("dedup_key", dedup_col) \
                         .withColumn("dedup_hash", F.xxhash64("dedup_key"))

        # ---- seen-set check: Bloom probe → exact anti-join ----
        frontier_keys = self._frontier_df().select(F.col(dedup).alias("seen_key"))
        if eng.use_bloom:
            bc = self.spark.sparkContext.broadcast(
                {b: s.to_bytes() for b, s in self._shards.items()}
            )
            allowed = allowed.withColumn(
                "cand_bucket",
                F.pmod(F.xxhash64(url_host(F.col("link"))),
                       F.lit(eng.num_buckets)).cast("int"),
            )

            @pandas_udf(T.BooleanType())
            def probe(hashes: pd.Series, buckets: pd.Series) -> pd.Series:
                import numpy as np
                blobs = bc.value
                h = hashes.to_numpy().astype(np.uint64)
                b = buckets.to_numpy()
                out = np.ones(len(h), dtype=bool)
                for bucket in np.unique(b):
                    mask = b == bucket
                    blob = blobs.get(int(bucket))
                    if blob is None:
                        out[mask] = False  # no shard → definitely new
                    else:
                        shard = BloomShard.from_bytes(blob)
                        out[mask] = shard.contains(h[mask])
                return pd.Series(out)

            allowed = allowed.withColumn(
                "maybe_seen", probe(F.col("dedup_hash"), F.col("cand_bucket"))
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
                frontier_keys.withColumn("is_seen_j", F.lit(True)),
                allowed["dedup_key"] == F.col("seen_key"), "left",
            ).withColumn(
                "is_seen", F.coalesce(F.col("is_seen_j"), F.lit(False))
            ).drop("is_seen_j", "seen_key")

        # ---- admission + new frontier rows ----
        if limit is not None:
            new_rows, n_new = self._admit_with_limit_replay(flagged, limit,
                                                            round_no)
        elif n_selected < eng.small_round_threshold:
            new_rows, n_new = self._admit_small_round(flagged, round_no)
        else:
            new_only = flagged.filter(~F.col("is_seen"))
            w_first = Window.partitionBy("dedup_key").orderBy(
                "source_priority", "source_seq", "link_pos")
            admitted = (
                new_only.withColumn("_rn", F.row_number().over(w_first))
                .filter(F.col("_rn") == 1).drop("_rn")
                .select("source_priority", "source_seq", "link_pos", "link",
                        "url_canon")
            )
            cols = admitted.select(
                F.col("link").alias("url"),
                F.col("url_canon"),
                url_host(F.col("link")).alias("host"),
                F.pmod(F.xxhash64(url_host(F.col("link"))),
                       F.lit(eng.num_buckets)).cast("int").alias("host_bucket"),
                url_depth(F.col("link")).alias("depth"),
                self._priority_col(url_depth(F.col("link")),
                                   url_host(F.col("link"))).alias("priority"),
                F.lit(round_no).alias("round_discovered"),
                F.col("source_priority"), F.col("source_seq"),
                F.col("link_pos"),
            )
            new_rows = self._pin(
                _assign_dense_seq(
                    cols, ["source_priority", "source_seq", "link_pos"],
                    self._next_seq)
                .drop("source_priority", "source_seq", "link_pos")
            )
            n_new = new_rows.count()

        io.append(new_rows, "frontier", round_no, partition_by=["host_bucket"])
        if eng.use_bloom and n_new:
            self._update_shards(new_rows, round_no)

        # ---- per-round metrics + per-bucket lineage ----
        denials = {
            r["denial_reason"]: r["count"]
            for r in cls.filter(~F.col("c.allowed"))
            .groupBy(F.col("c.denial_reason").alias("denial_reason"))
            .count().collect()
        }
        bucket_counts = getattr(self, "_last_bucket_counts", {})
        io.append_json(
            {
                "round": round_no, "fetched": n_selected, "new_urls": n_new,
                "processed": self._processed + n_selected,
                "denials": denials,
                "bucket_new_counts": {
                    str(k): v for k, v in sorted(bucket_counts.items())
                },
            },
            "round_metrics", round_no,
        )

        # ---- commit + in-memory state advance ----
        io.commit_round(
            round_no,
            processed=self._processed + n_selected,
            next_seq=self._next_seq + n_new,
            done=False,
        )
        self._processed += n_selected
        self._next_seq += n_new
        self._frontier_count += n_new
        self._frontier_parts.append(new_rows)
        self._fetched_seq_parts.append(
            selected.select(F.col("seq").alias("fseq")))
        self._compact_parts()
        return True

    def _admit_small_round(self, flagged: DataFrame,
                           round_no: int) -> tuple[DataFrame, int]:
        """Unlimited-crawl admission for small rounds, on the driver:
        first-occurrence-wins over (source_priority, source_seq, link_pos) —
        bitwise-identical to the distributed window+zipWithIndex path,
        without its per-round fixed cost."""
        rows = (
            flagged.filter(~F.col("is_seen"))
            .select("source_priority", "source_seq", "link_pos", "link",
                    "url_canon", "dedup_key")
            .orderBy("source_priority", "source_seq", "link_pos").collect()
        )
        seen: set[str] = set()
        admitted: list[tuple] = []
        seq = self._next_seq
        for r in rows:
            if r["dedup_key"] in seen:
                continue
            seen.add(r["dedup_key"])
            link = r["link"]
            admitted.append((
                link, r["url_canon"], urlkit.url_host(link), 0,
                urlkit.get_url_depth(urlkit.url_path(link)),
                self.cfg.priority_of(link), round_no, seq,
            ))
            seq += 1
        df = self.spark.createDataFrame(admitted, FRONTIER_SCHEMA).coalesce(
            max(1, len(admitted) // 2048 + 1)
        ).withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("host"), F.lit(self.engine.num_buckets)).cast("int"),
        )
        return self._pin(df), len(admitted)

    def _admit_with_limit_replay(
        self, flagged: DataFrame, limit: int, round_no: int,
    ) -> tuple[DataFrame, int]:
        """Sequential cross-page admission semantics (crawlService.ts:57-66 +
        crawler.rs:267-269): per source page in seq order, accepted links
        (dups included) consume the per-page ``remaining`` budget; only
        unseen ones join the frontier. Candidate set is bounded by the API
        page limit (≤10k) → small driver replay; seqs assigned inline."""
        rows = (
            flagged.select("source_priority", "source_seq", "link_pos",
                           "link", "url_canon", "dedup_key", "is_seen")
            .orderBy("source_priority", "source_seq", "link_pos").collect()
        )
        eng = self.engine
        admitted: list[tuple] = []
        round_new: set[str] = set()
        total = self._frontier_count
        cur_seq = None
        acc = 0
        remaining = limit - total
        seq = self._next_seq
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
                link = r["link"]
                admitted.append((
                    link, r["url_canon"], urlkit.url_host(link), 0,
                    urlkit.get_url_depth(urlkit.url_path(link)),
                    self.cfg.priority_of(link), round_no, seq,
                ))
                seq += 1
                total += 1
        df = self.spark.createDataFrame(admitted, FRONTIER_SCHEMA).coalesce(
            max(1, len(admitted) // 2048 + 1)
        )
        df = df.withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("host"), F.lit(eng.num_buckets)).cast("int"),
        )
        return self._pin(df), len(admitted)
