"""webcrawl_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the query/data-processing capabilities of
Arxtect/WebCrawl (reference snapshot at /root/reference, read-only) as an
idiomatic Spark DataFrame engine:

- ``kernels``   — pure-Python row kernels (URL classify, HTML clean/markdown/
                  links/images/metadata, gatekeeper, robots). No Spark imports;
                  unit-tested against the reference's own test vectors.
- ``functions`` — vectorized pandas/Arrow UDF wrappers over the kernels.
- ``operators`` — DataFrame-level operators (scrape, dedup, similarity,
                  text stats, multimodal plumbing).
- ``frontier``  — the crawl frontier: seen-filter shards, politeness budget,
                  priority queue, round scheduler, checkpoint/resume.
- ``sources``   — table IO seam (partitioned parquet + manifest standing in
                  for Iceberg when Iceberg jars are absent) and sitemap
                  ingestion.

Design notes: DataFrame/Catalyst first; per-row work only inside Arrow-batched
pandas UDFs (never row-at-a-time Python); cheap native predicates stay as
Column expressions ahead of UDF stages so Catalyst can prune early.
"""

__version__ = "0.1.0"
