"""Training-data-pipeline operators: dedup family, similarity search,
text stats, multimodal plumbing, sitemap ingestion."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 20),
        (2, "the quick brown fox jumps over the lazy dog " * 20),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog and then rests " * 18),  # near dup
        (4, "completely different content about spark shuffle partitions " * 15),
        (5, "der schnelle braune fuchs springt und die hunde sind nicht da " * 10),
        (6, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


class TestExactDedup:
    def test_keeps_lowest_id(self, spark, docs_df):
        from webcrawl_spark.operators.dedup import exact_dedup

        out = exact_dedup(docs_df).select("doc_id").collect()
        ids = sorted(r[0] for r in out)
        assert 1 in ids and 2 not in ids
        assert {3, 4, 5, 6} <= set(ids)

    def test_whitespace_case_insensitive(self, spark):
        from webcrawl_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "other")],
            "doc_id int, text string",
        )
        assert exact_dedup(df).count() == 2


class TestMinHash:
    def test_near_dup_pair_found(self, spark, docs_df):
        from webcrawl_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(docs_df, num_perm=64, bands=16,
                                  threshold=0.5).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (1, 2) in found  # exact dups always collide
        assert all(a < b for a, b in found)

    def test_dedup_drops_losers(self, spark, docs_df):
        from webcrawl_spark.operators.dedup import minhash_lsh_dedup

        kept = {r["doc_id"] for r in
                minhash_lsh_dedup(docs_df, threshold=0.5).collect()}
        assert 1 in kept and 2 not in kept
        assert 4 in kept and 6 in kept

    def test_signatures_deterministic(self, spark, docs_df):
        from webcrawl_spark.operators.dedup import minhash_signatures

        udf = minhash_signatures(num_perm=16)
        a = docs_df.select(udf(F.col("text")).alias("s")).collect()
        b = docs_df.select(udf(F.col("text")).alias("s")).collect()
        assert [r["s"] for r in a] == [r["s"] for r in b]


class TestSimHash:
    def test_near_dup_pairs(self, spark, docs_df):
        """Default (vectorized FNV scale path) finds exact dups, separates
        distinct docs."""
        from webcrawl_spark.operators.dedup import simhash_near_dup_pairs

        pairs = simhash_near_dup_pairs(docs_df, max_hamming=3).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (1, 2) in found
        assert (1, 4) not in found and (4, 5) not in found

    def test_md5_oracle_variant_same_pairs(self, spark, docs_df):
        """The md5 (oracle-recomputable) variant finds the same near-dup
        pairs on this corpus — the hash differs, the verdicts agree."""
        from webcrawl_spark.operators.dedup import (
            simhash_column, simhash_near_dup_pairs,
        )

        pairs = simhash_near_dup_pairs(docs_df, max_hamming=3,
                                       simhash=simhash_column()).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (1, 2) in found
        assert (1, 4) not in found and (4, 5) not in found

    def test_fnv_hashes_vectorized_match_scalar(self):
        """The padded-matrix FNV-1a equals the straightforward scalar
        FNV-1a for mixed-length unicode tokens."""
        import numpy as np

        from webcrawl_spark.operators.dedup import _fnv1a_hashes

        def scalar_fnv(t: str) -> int:
            h = 0xCBF29CE484222325
            for b in t.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h

        toks = ["a", "hello", "wörld", "", "longer-token-here", "日本語"]
        got = _fnv1a_hashes(toks)
        want = np.array([scalar_fnv(t) for t in toks], dtype=np.uint64)
        assert (got == want).all()


class TestNgramJaccard:
    def test_exact_pairs(self, spark, docs_df):
        from webcrawl_spark.operators.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(docs_df.limit(4), threshold=0.4).collect()
        found = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
        assert found[(1, 2)] == pytest.approx(1.0)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(3)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        if i < 3:  # near-dups of base
            v = base + rng.standard_normal(16) * 0.01
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>").cache()


class TestSimilarity:
    def test_brute_force_topk(self, spark, emb_df):
        from webcrawl_spark.operators.similarity import cosine_topk

        base = emb_df.filter("vec_id = 0").first()["embedding"]
        top = cosine_topk(emb_df, list(base), k=3).collect()
        assert top[0]["vec_id"] == 0
        assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
        assert {r["vec_id"] for r in top} == {0, 1, 2}

    def test_ann_matches_exact_for_easy_query(self, spark, emb_df):
        from webcrawl_spark.operators.similarity import ann_topk, cosine_topk

        base = emb_df.filter("vec_id = 0").first()["embedding"]
        exact = [r["vec_id"] for r in cosine_topk(emb_df, list(base), k=3).collect()]
        approx = [r["vec_id"] for r in
                  ann_topk(emb_df, list(base), k=3, dim=16, n_bits=6).collect()]
        # near-identical vectors share buckets; top hit must match
        assert approx[0] == exact[0]
        assert set(approx) & set(exact)

    def test_near_dup_pairs(self, spark, emb_df):
        from webcrawl_spark.operators.similarity import embedding_near_dup_pairs

        pairs = embedding_near_dup_pairs(emb_df, dim=16, threshold=0.99,
                                         n_bits=4).collect()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (0, 1) in found and (0, 2) in found


class TestTextStats:
    def test_stats_columns(self, spark, docs_df):
        from webcrawl_spark.operators.textstats import with_text_stats

        out = with_text_stats(docs_df).filter("doc_id = 1").first()
        assert out["n_tokens"] == 9 * 20
        assert out["quality"] > 0.5
        assert out["lang_guess"] == "en"
        assert out["fingerprint"] is not None

    def test_language_guess(self, spark, docs_df):
        from webcrawl_spark.operators.textstats import language_guess

        rows = {r["doc_id"]: r["lang"] for r in docs_df.select(
            "doc_id", language_guess(F.col("text")).alias("lang")).collect()}
        assert rows[5] == "de"
        assert rows[6] == "und"

    def test_fingerprint_dedup_consistency(self, spark, docs_df):
        from webcrawl_spark.operators.textstats import fingerprint

        fps = docs_df.select(fingerprint(F.col("text")).alias("f")).collect()
        assert fps[0]["f"] == fps[1]["f"]
        assert fps[0]["f"] != fps[3]["f"]


class TestMultimodal:
    def test_fake_decode_plumbing(self, spark):
        from webcrawl_spark.operators.multimodal import image_features

        rows = [(f"m{i}", bytes([i] * (100 + i))) for i in range(10)]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = image_features(df, fake=True).collect()
        assert len(out) == 10
        r = next(x for x in out if x["media_id"] == "m3")
        assert r["n_bytes"] == 103
        assert len(r["feature"]) == 8
        assert r["width"] >= 64 and r["height"] >= 64

    def test_real_decode_rejects_garbage(self):
        from webcrawl_spark.operators.multimodal import _decode_image_real

        with pytest.raises(ValueError):
            _decode_image_real(b"x")

    def test_frame_sample_plan(self, spark):
        from webcrawl_spark.operators.multimodal import frame_sample_plan

        df = spark.createDataFrame([("v1", 10.0), ("v2", 1.0)],
                                   "media_id string, duration_s double")
        out = frame_sample_plan(df, fps=0.5).collect()
        v1 = [r for r in out if r["media_id"] == "v1"]
        assert len(v1) == 5
        assert v1[1]["frame_ts"] == pytest.approx(2.0)

    def test_audio_plumbing(self, spark):
        from webcrawl_spark.operators.multimodal import (
            _decode_audio_real, audio_features,
        )

        rows = [(f"a{i}", bytes([i] * (200 + i))) for i in range(6)]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {r["media_id"]: r for r in
               audio_features(df, fake=True).collect()}
        assert len(out) == 6
        r = out["a4"]
        assert r["n_bytes"] == 204 and r["n_samples"] == 102
        assert r["duration_s"] == pytest.approx(102 / r["sample_rate"])
        assert len(r["feature"]) == 8
        with pytest.raises(ValueError):
            _decode_audio_real(b"x")

    def test_audio_real_decode(self, spark):
        import numpy as np

        from webcrawl_spark.kernels.audiokit import encode_wav
        from webcrawl_spark.operators.multimodal import audio_features

        samples = (np.arange(800) * 997 % 65536 - 32768).astype(np.int64)
        rows = [
            ("wav_ok", bytearray(encode_wav(samples, 16000))),
            ("mp3_ref", bytearray(b"\xff\xfb\x90\x00 fake mpeg frame")),
            ("junk", bytearray(b"definitely not audio")),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {r["media_id"]: r for r in
               audio_features(df, fake=False).collect()}
        ok = out["wav_ok"]
        assert ok["format"] == "wav"
        assert ok["sample_rate"] == 16000 and ok["n_samples"] == 800
        assert ok["duration_s"] == pytest.approx(0.05)
        assert sum(ok["feature"]) == pytest.approx(1.0, abs=1e-5)
        assert out["mp3_ref"]["format"] == "unsupported:mp3"
        assert out["mp3_ref"]["sample_rate"] is None
        assert out["junk"]["format"] == "error"

    def test_resize_plumbing(self, spark):
        from webcrawl_spark.operators.multimodal import (
            _decode_image_fake, _resize_image_real, resize_images,
        )

        rows = [(f"m{i}", bytes([i] * 4000)) for i in range(6)]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {r["media_id"]: r for r in
               resize_images(df, max_w=100, max_h=80, fake=True).collect()}
        assert len(out) == 6
        for i in range(6):
            r = out[f"m{i}"]
            src_w, src_h, _, _ = _decode_image_fake(bytes([i] * 4000))
            # aspect-preserving fit, never upscaled
            assert r["width"] <= 100 and r["height"] <= 80
            assert r["scale"] <= 1.0
            assert r["width"] == max(1, int(src_w * r["scale"]))
            assert len(r["resized"]) <= 4000
            # byte budget tracks the area ratio
            assert len(r["resized"]) == max(
                1, int(4000 * r["scale"] * r["scale"]))
        with pytest.raises(ValueError):
            _resize_image_real(b"x", 10, 10)


class TestSitemap:
    def test_parse_urlset(self):
        from webcrawl_spark.sources.sitemap import parse_sitemap_xml

        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://example.com/page1</loc></url>"
            "<url><loc>https://example.com/page2</loc></url></urlset>"
        )
        assert parse_sitemap_xml(xml)["urlset"] == [
            "https://example.com/page1", "https://example.com/page2",
        ]

    def test_parse_invalid_root(self):
        from webcrawl_spark.sources.sitemap import parse_sitemap_xml

        with pytest.raises(ValueError, match="Invalid sitemap format"):
            parse_sitemap_xml("<invalid><url/></invalid>")

    def test_parse_malformed(self):
        from webcrawl_spark.sources.sitemap import parse_sitemap_xml

        with pytest.raises(ValueError):
            parse_sitemap_xml("<urlset><url><loc>x</loc></url></urlset")

    def test_process_splits_and_drops_files(self):
        # crawler.rs:816-851
        from webcrawl_spark.sources.sitemap import process_sitemap

        xml = (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://example.com/page1</loc></url>"
            "<url><loc>https://example.com/sitemap2.xml</loc></url>"
            "<url><loc>https://example.com/image.png</loc></url></urlset>"
        )
        result = process_sitemap(xml)
        by_action = {i["action"]: i["urls"] for i in result["instructions"]}
        assert by_action["recurse"] == ["https://example.com/sitemap2.xml"]
        assert by_action["process"] == ["https://example.com/page1"]

    def test_iterative_recursion_with_cap(self, spark, small_site):
        from webcrawl_spark.sources.sitemap import sitemap_urls_df

        host = small_site.hosts[0]
        rows = [(u, x) for u, x in small_site.sitemaps.items()]
        table = spark.createDataFrame(rows, "url string, body string")
        out = sitemap_urls_df(spark, table, f"https://{host}/").collect()
        urls = [r["page_url"] for r in out]
        assert urls  # index → sub-sitemaps → page urls
        assert all(not u.endswith(".png") for u in urls)
        assert len(urls) == len(set(urls))

    def test_gz_sitemap(self, spark, small_site):
        from webcrawl_spark.sources.sitemap import _process_sitemap_udf

        (gz_url, gz_bytes), = small_site.sitemaps_gz.items()
        df = spark.createDataFrame([(gz_url, bytearray(gz_bytes))],
                                   "url string, body binary")
        row = df.select(_process_sitemap_udf(F.col("body")).alias("p")).first()
        assert row["p"]["error"] is None
        assert row["p"]["process"]


class TestDupComponents:
    """Connected components over near-dup pairs (dedup grouping):
    min-label propagation + pointer doubling."""

    def _components(self, spark, pairs):
        from webcrawl_spark.operators.dedup import dup_components

        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        out = dup_components(df).collect()
        return {r["doc"]: r["component"] for r in out}

    def test_two_clusters(self, spark):
        got = self._components(spark, [(1, 2), (2, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_converges(self, spark):
        """A 12-node path is the adversarial case for plain label prop
        (O(diameter)); pointer doubling must still converge within the
        iteration cap."""
        chain = [(i, i + 1) for i in range(1, 12)]
        got = self._components(spark, chain)
        assert set(got.values()) == {1}
        assert len(got) == 12

    def test_cross_cluster_bridge(self, spark):
        """Two clusters merged by one bridge pair collapse to one
        component labeled by the global min."""
        got = self._components(spark, [(5, 6), (8, 9), (6, 8)])
        assert set(got.values()) == {5}

    def test_star_cluster_with_degree_cap(self, spark):
        """Adversarial boilerplate shape: one hub matched by 400 docs (the
        giant-component case at corpus scale). With max_degree set the hub's
        adjacency is capped (skew guard) yet the star still converges to one
        component because the LOWEST-id neighbors are the ones kept; a side
        cluster must stay separate (cap can split, never merge)."""
        from webcrawl_spark.operators.dedup import dup_components

        hub = 1
        star = [(hub, i) for i in range(2, 402)]
        side = [(1000, 1001)]
        df = spark.createDataFrame(star + side, "doc_a long, doc_b long")
        out = dup_components(df, max_degree=8).collect()
        got = {r["doc"]: r["component"] for r in out}
        star_nodes = {n for n, c in got.items() if n < 1000}
        assert star_nodes == set(range(1, 402))
        assert {got[n] for n in star_nodes} == {1}
        assert got[1000] == got[1001] == 1000


class TestEnsureParallel:
    def test_single_partition_input_is_spread(self, spark):
        """A one-file parquet read arrives as one partition; the signature
        stages must fan it out to the scheduler's parallelism so the
        Arrow-UDF work doesn't serialize on one core."""
        from webcrawl_spark.operators.dedup import _ensure_parallel

        df = spark.range(1000).coalesce(1)
        out = _ensure_parallel(df)
        assert out.rdd.getNumPartitions() == \
            spark.sparkContext.defaultParallelism

    def test_already_parallel_input_untouched(self, spark):
        """At corpus scale inputs carry >= cores partitions — the guard must
        be an identity there (no extra shuffle in the plan)."""
        from webcrawl_spark.operators.dedup import _ensure_parallel

        n = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(n + 4)
        assert _ensure_parallel(df) is df


class TestRepetitionStats:
    def test_duplicate_ngrams_counted(self, spark):
        from webcrawl_spark.operators.textstats import with_repetition_stats

        rows = [
            (1, "spam spam spam spam"),             # all repeats
            (2, "alpha beta gamma delta epsilon"),  # no repeats
            (3, ""),                                # empty doc
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
        # doc 1: 3 bigrams, all "spam spam" -> 2/3 duplicated; top word 4/4
        assert got[1]["dup_2gram_frac"] == pytest.approx(2 / 3)
        assert got[1]["dup_3gram_frac"] == pytest.approx(1 / 2)
        assert got[1]["top_word_frac"] == pytest.approx(1.0)
        assert got[2]["dup_2gram_frac"] == 0.0
        assert got[2]["top_word_frac"] == pytest.approx(1 / 5)
        assert got[3]["dup_2gram_frac"] == 0.0
        assert got[3]["top_word_frac"] == 0.0

    def test_top_word_fold_matches_groupby(self, spark):
        """The linear sorted-run fold must equal the straightforward
        explode+groupBy max count."""
        from webcrawl_spark.operators.textstats import (
            repetition_stats, _words)

        rows = [(i, " ".join(
            ["w%d" % ((i * 7 + j * j) % 13) for j in range(40)]))
            for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        fold = {r["doc_id"]: r["f"] for r in df.select(
            "doc_id",
            repetition_stats(F.col("text"))["top_word_frac"].alias("f"),
        ).collect()}
        ref = {
            r["doc_id"]: r["m"] / 40
            for r in df.select("doc_id",
                               F.explode(_words(F.col("text"))).alias("w"))
            .groupBy("doc_id", "w").count()
            .groupBy("doc_id").agg(F.max("count").alias("m")).collect()
        }
        assert fold == pytest.approx(ref)


class TestRedactPii:
    def test_all_pattern_classes(self, spark):
        from webcrawl_spark.operators.textstats import redact_pii

        rows = [(1, "mail bob.smith+x@corp.example.co, ip 10.0.255.7, "
                    "card 4111111111111111, call +1 (555) 010-9999 now")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
        assert "<EMAIL>" in out and "bob" not in out
        assert "<IP>" in out and "10.0.255.7" not in out
        assert "<CARD>" in out and "4111111111111111" not in out
        assert "<PHONE>" in out and "555" not in out

    def test_clean_text_untouched(self, spark):
        from webcrawl_spark.operators.textstats import redact_pii

        txt = "an ordinary sentence with version 2.5 and year 2024"
        df = spark.createDataFrame([(1, txt)], "doc_id int, text string")
        assert df.select(redact_pii(F.col("text")).alias("t")).first()["t"] == txt


class TestBoilerplateLines:
    def test_common_lines_removed_order_kept(self, spark):
        from webcrawl_spark.operators.dedup import remove_boilerplate_lines

        cookie = "Accept cookies to continue"
        rows = [
            (1, f"{cookie}\nunique first body\nmore text one"),
            (2, f"{cookie}\nunique second body"),
            (3, f"accept cookies to continue\nunique third body"),  # case-insensitive hit
            (4, "entirely unique document"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               remove_boilerplate_lines(df, min_docs=3).collect()}
        assert got[1]["text"] == "unique first body\nmore text one"
        assert got[1]["n_lines_removed"] == 1
        assert got[3]["text"] == "unique third body"
        assert got[4]["text"] == "entirely unique document"
        assert got[4]["n_lines_removed"] == 0

    def test_blank_lines_never_boilerplate(self, spark):
        from webcrawl_spark.operators.dedup import remove_boilerplate_lines

        rows = [(i, f"para{i} a\n\npara{i} b") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = remove_boilerplate_lines(df, min_docs=2).collect()
        assert all(r["n_lines_removed"] == 0 for r in out)
        assert all("\n\n" in r["text"] for r in out)

    def test_repeated_line_within_one_doc_all_dropped(self, spark):
        from webcrawl_spark.operators.dedup import remove_boilerplate_lines

        rows = [(1, "nav menu\nbody one\nnav menu"), (2, "nav menu\nbody two")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               remove_boilerplate_lines(df, min_docs=2).collect()}
        assert got[1]["text"] == "body one"
        assert got[1]["n_lines_removed"] == 2


class TestCorpusOps:
    def test_deterministic_sample_reproducible(self, spark):
        from webcrawl_spark.operators.corpus import deterministic_sample

        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r[0] for r in deterministic_sample(df, 0.5).collect()}
        b = {r[0] for r in
             deterministic_sample(df.repartition(7), 0.5).collect()}
        assert a == b                      # partitioning-independent
        assert 850 <= len(a) <= 1150      # ~Binomial(2000, .5)
        c = {r[0] for r in deterministic_sample(df, 0.5, salt="s1").collect()}
        assert c != a                      # new salt = independent draw

    def test_stratified_sample_rates(self, spark):
        from webcrawl_spark.operators.corpus import stratified_sample

        rows = [(i, "keep" if i % 2 else "drop") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = stratified_sample(df, {"keep": 1.0, "drop": 0.0}).collect()
        assert len(out) == 500
        assert all(r["source"] == "keep" for r in out)

    def test_corpus_mixture_shares(self, spark):
        from webcrawl_spark.operators.corpus import corpus_mixture

        rows = [(1, "a", "en", "one two three"), (2, "a", "en", "four five"),
                (3, "b", "de", "sechs sieben acht neun zehn")]
        df = spark.createDataFrame(
            rows, "doc_id int, source string, lang string, text string")
        got = {(r["source"], r["lang"]): r for r in corpus_mixture(df).collect()}
        assert got[("a", "en")]["n_docs"] == 2
        assert got[("a", "en")]["n_words"] == 5
        assert got[("a", "en")]["word_share"] == pytest.approx(0.5)
        assert sum(r["word_share"] for r in got.values()) == pytest.approx(1.0)

    def test_chunk_windows(self, spark):
        from webcrawl_spark.operators.corpus import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(10))), (2, "")],
            "doc_id int, text string")
        out = chunk_documents(df, max_words=4, overlap=1).collect()
        by_chunk = {(r["doc_id"], r["chunk_id"]): r for r in out}
        # step 3 over 10 words -> starts 0,3,6; a start at 9 would emit
        # "w9", a strict sub-span of the chunk at 6 — must not appear
        assert {k for k in by_chunk if k[0] == 1} == {(1, i) for i in range(3)}
        assert by_chunk[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
        assert by_chunk[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
        assert by_chunk[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
        assert not [k for k in by_chunk if k[0] == 2]   # empty doc: no chunks

    def test_chunk_no_subset_tails(self, spark):
        """Every word is covered and no chunk is contained in another,
        across lengths around the window boundaries."""
        from webcrawl_spark.operators.corpus import chunk_documents

        rows = [(m, " ".join(f"w{i}" for i in range(m)))
                for m in range(1, 30)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = chunk_documents(df, max_words=8, overlap=3).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                r["chunk_text"].split(" "))
        for m, chunks in by_doc.items():
            covered = {w for c in chunks for w in c}
            assert covered == {f"w{i}" for i in range(m)}
            spans = [set(c) for c in chunks]
            for i, a in enumerate(spans):
                assert not any(a < b for j, b in enumerate(spans) if i != j)

    def test_chunk_overlap_validation(self, spark):
        from webcrawl_spark.operators.corpus import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(spark.range(1), max_words=4, overlap=4)


class TestIvf:
    @pytest.fixture(scope="class")
    def clustered(self, spark):
        rng = np.random.RandomState(3)
        centers = rng.standard_normal((12, 16)) * 4
        rows = [(i, (centers[i % 12] + rng.standard_normal(16) * 0.3).tolist())
                for i in range(600)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>").cache(), centers

    def test_train_deterministic_partition_independent(self, spark, clustered):
        from webcrawl_spark.operators.similarity import train_ivf_centroids

        df, _ = clustered
        a = train_ivf_centroids(df, dim=16, n_cells=12, iters=5)
        b = train_ivf_centroids(df.repartition(9), dim=16, n_cells=12, iters=5)
        assert np.allclose(a, b)
        assert a.shape == (12, 16)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_recall_vs_exact(self, spark, clustered):
        from webcrawl_spark.operators.similarity import (
            cosine_topk, ivf_topk, train_ivf_centroids)

        df, centers = clustered
        cents = train_ivf_centroids(df, dim=16, n_cells=12, iters=5)
        query = centers[4].tolist()
        exact = [r["vec_id"] for r in
                 cosine_topk(df, query, k=10).collect()]
        approx = [r["vec_id"] for r in
                  ivf_topk(df, query, cents, k=10, nprobe=3).collect()]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.9

    def test_random_anchor_config_probes_subset(self, spark, clustered):
        """The data-independent anchor quantizer (oracle config) must only
        ever scan the probed cells."""
        from webcrawl_spark.operators.similarity import (
            ivf_assign, ivf_topk, random_anchors)

        df, centers = clustered
        anchors = random_anchors(16, 8, seed=11)
        assigned = ivf_assign(df, anchors)
        cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
        assert cells <= set(range(8))
        out = ivf_topk(assigned, centers[0].tolist(), anchors, k=5, nprobe=2)
        assert len(out.collect()) == 5


class TestDecontamination:
    @pytest.fixture(scope="class")
    def corpus_and_bench(self, spark):
        bench_q = "what is the capital of france and when was it founded"
        corpus = spark.createDataFrame([
            (1, "intro text " + bench_q + " trailing words here"),  # leaked
            (2, "a perfectly clean document about spark internals and "
                "shuffle partitioning strategies for large clusters"),
            (3, "short doc"),                                       # < n words
        ], "doc_id int, text string")
        bench = spark.createDataFrame(
            [(100, bench_q)], "qid int, text string")
        return corpus, bench

    def test_flags_leaked_doc(self, spark, corpus_and_bench):
        from webcrawl_spark.operators.corpus import contamination_flags

        corpus, bench = corpus_and_bench
        got = {r["doc_id"]: r["n_contaminated_ngrams"]
               for r in contamination_flags(corpus, bench, n=8).collect()}
        # the 11-word question yields 4 8-grams, all present in doc 1
        assert got[1] == 4
        assert got[2] == 0
        assert got[3] == 0

    def test_decontaminate_drops_only_leaked(self, spark, corpus_and_bench):
        from webcrawl_spark.operators.corpus import decontaminate

        corpus, bench = corpus_and_bench
        kept = sorted(r["doc_id"] for r in
                      decontaminate(corpus, bench, n=8).collect())
        assert kept == [2, 3]


class TestGopherFlags:
    def test_rule_boundaries(self, spark):
        from webcrawl_spark.operators.textstats import with_gopher_flags

        good = ("the quick brown fox and the lazy dog have fun with that "
                "ball of yarn to be honest ") * 5          # 95 words, stopwords
        short = "too few words here"
        bullety = "\n".join(f"- item {i}" for i in range(10))
        symbols = "#tag " * 60
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, bullety), (4, symbols), (5, "")],
            "doc_id int, text string")
        got = {r["doc_id"]: r for r in with_gopher_flags(df).collect()}
        assert got[1]["gopher_pass"]
        assert not got[2]["ok_word_count"] and not got[2]["gopher_pass"]
        assert not got[3]["ok_bullet_lines"]
        assert not got[4]["ok_symbol_ratio"]
        assert not got[5]["gopher_pass"]

    def test_ellipsis_lines(self, spark):
        from webcrawl_spark.operators.textstats import with_gopher_flags

        text = "\n".join(["trailing thought..."] * 4 + ["a normal line"] * 6)
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        row = with_gopher_flags(df).first()
        assert not row["ok_ellipsis_lines"]   # 0.4 > 0.3


class TestRedactPiiLineBoundary:
    def test_digit_lines_not_merged_across_newlines(self, spark):
        """Two unrelated digit runs on separate lines must not collapse
        into one <PHONE> redaction that swallows the newline."""
        from webcrawl_spark.operators.textstats import redact_pii

        txt = "call 555 012-3456\nfax 555 019-9876"
        df = spark.createDataFrame([(1, txt)], "doc_id int, text string")
        out = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
        assert out == "call <PHONE>\nfax <PHONE>"   # two redactions, newline kept


class TestDuplicatePassages:
    def test_cross_doc_windows_flagged(self, spark):
        from webcrawl_spark.operators.corpus import duplicate_passage_fraction

        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, shared + " unique one two three"),
            (2, shared + " other tail words here"),
            (3, "entirely different content with no overlap at all ok"),
            (4, "tiny"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               duplicate_passage_fraction(df, n=6).collect()}
        # the shared 6-word prefix is the only window both docs contain
        assert got[1]["n_windows"] == 5 and got[1]["dup_frac"] == pytest.approx(0.2)
        assert got[2]["dup_frac"] == pytest.approx(0.2)
        assert got[3]["dup_frac"] == 0.0
        assert got[4]["n_windows"] == 0 and got[4]["dup_frac"] == 0.0

    def test_within_doc_repeat_not_counted(self, spark):
        """A window repeated only inside ONE doc is within-doc repetition
        (repetition_stats territory), not inter-document duplication."""
        from webcrawl_spark.operators.corpus import duplicate_passage_fraction

        rows = [(1, "a b c d a b c d"), (2, "x y z w v u t s")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r["dup_frac"] for r in
               duplicate_passage_fraction(df, n=4).collect()}
        assert got[1] == 0.0 and got[2] == 0.0


class TestC4Rules:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) — line filter + doc flags.
    Reference behavior: TensorFlow-datasets c4_utils (public); oracle twin
    q_c4_quality in __spark_entry__.py."""

    def test_line_filter(self, spark):
        from webcrawl_spark.operators.textstats import c4_clean

        text = "\n".join([
            "This line has five proper words.",     # kept
            "Too short.",                           # < 3 words
            "no terminal punctuation here",         # no [.!?"] ending
            "Enable JavaScript to view this page.", # javascript mention
            '  "Quoted speech counts as terminal."',  # kept (quote ending)
        ])
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        out = df.select(c4_clean(F.col("text")).alias("t")).first()["t"]
        assert out == ('This line has five proper words.\n'
                       '"Quoted speech counts as terminal."')

    def test_doc_flags(self, spark):
        from webcrawl_spark.operators.textstats import with_c4_flags

        good = " ".join(["This is a perfectly fine sentence number %d." % i
                         for i in range(6)])
        rows = [
            (1, good),
            (2, "Lorem ipsum dolor sit amet filler text here."),
            (3, "A sentence with code { inside } braces is dropped."),
            (4, "This casino page should fail the badword screen."),
            (5, ""),  # empty -> no sentences
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in with_c4_flags(df).collect()}
        assert got[1]["c4_pass"]
        assert not got[2]["ok_lorem"] and not got[2]["c4_pass"]
        assert not got[3]["ok_brace"]
        assert not got[4]["ok_badwords"]
        assert not got[5]["ok_sentences"] and got[5]["c4_text"] == ""

    def test_sentence_count_on_filtered_text(self, spark):
        """Sentences are counted AFTER the line filter: a doc whose only
        punctuation lives on dropped lines has zero sentences."""
        from webcrawl_spark.operators.textstats import with_c4_flags

        text = "\n".join(["Ok."] * 10)    # each line < 3 words -> all dropped
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        row = with_c4_flags(df).first()
        assert row["c4_text"] == "" and not row["ok_sentences"]


class TestCcnetNormalize:
    def test_normalization_key(self, spark):
        from webcrawl_spark.operators.textstats import normalize_for_dedup

        rows = [
            (1, "Hello,  World! 2024 edition"),
            (2, "hello world 1999 EDITION"),   # same key as 1
            (3, "hello world edition"),        # different (no digit slot)
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r["k"] for r in
               df.select("doc_id",
                         normalize_for_dedup(F.col("text")).alias("k"))
                 .collect()}
        assert got[1] == got[2] == "hello world 0000 edition"
        assert got[3] == "hello world edition"

    def test_whitespace_and_unicode_scope(self, spark):
        from webcrawl_spark.operators.textstats import normalize_for_dedup

        df = spark.createDataFrame(
            [(1, "tabs\tand\nnewlines   spaces")], "doc_id int, text string")
        out = df.select(
            normalize_for_dedup(F.col("text")).alias("k")).first()["k"]
        assert out == "tabs and newlines spaces"


class TestRemoveDuplicatePassages:
    def test_cross_doc_passage_cut(self, spark):
        from webcrawl_spark.operators.corpus import remove_duplicate_passages

        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, shared + " unique one two three"),
            (2, shared + " other tail words here"),
            (3, "entirely different content with no overlap at all ok"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               remove_duplicate_passages(df, n=6).collect()}
        assert got[1]["clean_text"] == "unique one two three"
        assert got[1]["n_removed"] == 6
        assert got[2]["clean_text"] == "other tail words here"
        assert got[3]["n_removed"] == 0
        assert got[4]["clean_text"] == "" and got[4]["n_words"] == 0

    def test_overlapping_windows_cover_union(self, spark):
        """Two docs sharing a 5-word run with n=4: both window starts are
        flagged and their union (all 5 words) is removed, not just one
        window."""
        from webcrawl_spark.operators.corpus import remove_duplicate_passages

        run = "one two three four five"
        rows = [(1, "head " + run + " tailone"),
                (2, "other " + run + " tailtwo")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               remove_duplicate_passages(df, n=4).collect()}
        assert got[1]["clean_text"] == "head tailone"
        assert got[1]["n_removed"] == 5

    def test_within_doc_repeat_not_removed(self, spark):
        from webcrawl_spark.operators.corpus import remove_duplicate_passages

        rows = [(1, "a b c d a b c d"), (2, "x y z w v u t s")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r["n_removed"] for r in
               remove_duplicate_passages(df, n=4).collect()}
        assert got[1] == 0 and got[2] == 0

    def test_mid_document_span_rejoins_clean(self, spark):
        from webcrawl_spark.operators.corpus import remove_duplicate_passages

        dup = "p q r s"
        rows = [(1, "before " + dup + " after"),
                (2, "x " + dup + " y")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r["clean_text"] for r in
               remove_duplicate_passages(df, n=4).collect()}
        assert got[1] == "before after"
        assert got[2] == "x y"
