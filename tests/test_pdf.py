"""PDF engine (S3/U6): build→metadata→text round-trip vectors mirroring
pdf.rs:13-45 (page count, Info-title-first lookup) and
engines/pdf/index.ts:21-34 + 87-120 (escaped text as html AND markdown,
150 ms/page budget), plus the Spark operator path."""

import re

import pytest

from webcrawl_spark.kernels.pdfkit import (
    LINES_PER_PAGE,
    MILLISECONDS_PER_PAGE,
    build_pdf,
    escape_html,
    pdf_metadata,
    pdf_text,
    scrape_pdf_result,
)


class TestKernel:
    def test_single_page_roundtrip(self):
        lines = ["hello world", "second line"]
        pdf = build_pdf(lines, title="One Pager")
        assert pdf.startswith(b"%PDF-1.4")
        assert pdf_metadata(pdf) == (1, "One Pager")
        assert pdf_text(pdf) == "hello world\nsecond line"

    def test_multi_page_layout(self):
        lines = [f"line {i}" for i in range(LINES_PER_PAGE * 2 + 5)]
        pdf = build_pdf(lines, title="Big")
        num_pages, title = pdf_metadata(pdf)
        assert num_pages == 3
        expected = "\n\n".join(
            "\n".join(lines[i:i + LINES_PER_PAGE])
            for i in range(0, len(lines), LINES_PER_PAGE)
        )
        assert pdf_text(pdf) == expected

    def test_special_chars_and_escaping(self):
        lines = ['quotes " and \' apos', "tags <b> & amp", r"back\slash (parens)",
                 "ünïcödé ✓"]
        pdf = build_pdf(lines, title="T (x) \\ y")
        assert pdf_metadata(pdf)[1] == "T (x) \\ y"
        assert pdf_text(pdf) == "\n".join(lines)
        r = scrape_pdf_result(pdf)
        # escape-html entity set, applied to the extracted text
        assert r["html"] == r["markdown"] == escape_html("\n".join(lines))
        assert "&quot;" in r["html"] and "&#39;" in r["html"]
        assert "&lt;b&gt;" in r["html"] and "&amp;" in r["html"]

    def test_title_fallback_without_info(self):
        """pdf.rs:32-41: no trailer Info → first object carrying /Title."""
        pdf = build_pdf(["x"], title=None)
        assert pdf_metadata(pdf) == (1, None)
        # splice a /Title into the Page object (not referenced from Info)
        patched = pdf.replace(b"/Type /Page /Parent",
                              b"/Type /Page /Title (Fallback)  /Parent", 1)
        assert pdf_metadata(patched)[1] == "Fallback"

    def test_title_whitespace_trimmed(self):
        pdf = build_pdf(["x"], title="  padded  ")
        assert pdf_metadata(pdf)[1] == "padded"

    def test_time_budget(self):
        lines = [f"l{i}" for i in range(LINES_PER_PAGE * 4)]  # 4 pages
        pdf = build_pdf(lines)
        budget = 4 * MILLISECONDS_PER_PAGE
        ok = scrape_pdf_result(pdf, timeout_ms=budget)
        assert ok["ok"] and not ok["insufficient_time"]
        tight = scrape_pdf_result(pdf, timeout_ms=budget - 1)
        assert tight["insufficient_time"] and tight["markdown"] == ""
        # max_pages caps the effective count (index.ts:93-95)
        capped = scrape_pdf_result(pdf, max_pages=2, timeout_ms=budget - 1)
        assert capped["num_pages"] == 2 and not capped["insufficient_time"]

    def test_garbage_payloads(self):
        assert scrape_pdf_result(None)["ok"] is False
        assert scrape_pdf_result(b"")["ok"] is False
        r = scrape_pdf_result(b"%PDF-1.4 garbage with no objects")
        assert r["num_pages"] == 0 and r["markdown"] == ""
        # non-pdf content (e.g. an HTML error page) → failed engine result
        # (the reference refuses non-pdf content-types, index.ts:75-86)
        assert scrape_pdf_result(b"<html><body>hi</body></html>")["ok"] is False

    def test_xref_offsets_valid(self):
        """The writer's xref offsets must point at the 'N 0 obj' headers."""
        pdf = build_pdf(["a", "b"], title="X")
        m = re.search(rb"xref\n0 (\d+)\n(.*?)trailer", pdf, re.S)
        entries = m.group(2).splitlines()[1:]  # skip the free entry
        for i, entry in enumerate(entries, start=1):
            off = int(entry.split()[0])
            assert pdf[off:].startswith(b"%d 0 obj" % i)


def _mini_pdf(objects: dict[int, bytes], trailer_extra: bytes = b"",
              root: int = 1) -> bytes:
    """Hand-rolled fixture builder: arbitrary object bodies + classic xref
    (for real-world-structure vectors the deterministic writer can't emit)."""
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for oid in sorted(objects):
        offsets[oid] = len(buf)
        buf += b"%d 0 obj\n" % oid + objects[oid] + b"\nendobj\n"
    xref_at = len(buf)
    max_id = max(objects)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (max_id + 1)
    for oid in range(1, max_id + 1):
        buf += b"%010d 00000 n \n" % offsets.get(oid, 0)
    buf += (b"trailer\n<< /Size %d /Root %d 0 R" % (max_id + 1, root)
            + trailer_extra + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(buf)


class TestRealWorldStructures:
    """pdf.rs:13-45 breadth: structures lopdf/pdf-parse handle that the
    deterministic writer never emits — hex strings, UTF-16BE titles, nested
    /Kids, object streams, filter chains, indirect /Length, plus the
    refusal taxonomy for encrypted/corrupt files."""

    def _page_objs(self, content: bytes, *, flate: bool = False,
                   content_id: int = 4) -> dict[int, bytes]:
        import zlib
        body = zlib.compress(content) if flate else content
        filt = b" /Filter /FlateDecode" if flate else b""
        return {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % content_id,
            content_id: b"<< /Length %d%s >>\nstream\n" % (len(body), filt)
            + body + b"\nendstream",
        }

    def test_hex_string_operands(self):
        content = b"BT <68656c6c6f> Tj (lit) Tj [<20>(mixed)] TJ ET"
        pdf = _mini_pdf(self._page_objs(content))
        assert pdf_text(pdf) == "hello\nlit\n mixed"

    def test_utf16be_title(self):
        title = "Žürich — ↑".encode("utf-16-be")
        hexs = (b"\xfe\xff" + title).hex().encode()
        objs = self._page_objs(b"BT (x) Tj ET")
        objs[5] = b"<< /Title <" + hexs + b"> >>"
        pdf = _mini_pdf(objs, trailer_extra=b" /Info 5 0 R")
        assert pdf_metadata(pdf) == (1, "Žürich — ↑")

    def test_utf16be_literal_title(self):
        raw = b"\xfe\xff" + "Tîtle".encode("utf-16-be")
        esc = b"".join(b"\\%03o" % b if b < 32 or b > 126 else bytes([b])
                       for b in raw)
        objs = self._page_objs(b"BT (x) Tj ET")
        objs[5] = b"<< /Title (" + esc + b") >>"
        pdf = _mini_pdf(objs, trailer_extra=b" /Info 5 0 R")
        assert pdf_metadata(pdf)[1] == "Tîtle"

    def test_nested_kids_page_tree(self):
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 >>",
            3: b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R 5 0 R] /Count 2 >>",
            4: b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>",
            5: b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>",
            6: b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>",
            7: b"<< /Length 14 >>\nstream\nBT (p1) Tj ET\nendstream",
            8: b"<< /Length 14 >>\nstream\nBT (p2) Tj ET\nendstream",
            9: b"<< /Length 14 >>\nstream\nBT (p3) Tj ET\nendstream",
        }
        pdf = _mini_pdf(objs)
        assert pdf_metadata(pdf)[0] == 3
        assert pdf_text(pdf) == "p1\n\np2\n\np3"

    def test_object_stream_pages(self):
        """PDF 1.5 packing: catalog/pages/page dicts live inside a
        FlateDecoded /Type /ObjStm; only the container is a top-level obj."""
        import zlib
        packed = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        ]
        header = b" ".join(b"%d %d" % (oid, off) for oid, off in
                           zip([p[0] for p in packed],
                               _cumoffsets([p[1] for p in packed])))
        payload = header + b" " + b" ".join(p[1] for p in packed)
        first = len(header) + 1
        comp = zlib.compress(payload)
        objs = {
            4: b"<< /Type /ObjStm /N 3 /First %d /Length %d "
               b"/Filter /FlateDecode >>\nstream\n" % (first, len(comp))
               + comp + b"\nendstream",
            5: b"<< /Length 16 >>\nstream\nBT (obst) Tj ET\nendstream",
        }
        pdf = _mini_pdf(objs)
        assert pdf_metadata(pdf)[0] == 1
        assert pdf_text(pdf) == "obst"

    def test_indirect_length(self):
        objs = self._page_objs(b"BT (ind) Tj ET")
        body = objs[4].split(b">>", 1)[1].split(b"stream\n", 1)[1] \
                      .rsplit(b"\nendstream", 1)[0]
        objs[4] = (b"<< /Length 5 0 R >>\nstream\n" + body + b"\nendstream")
        objs[5] = b"%d" % len(body)
        pdf = _mini_pdf(objs)
        assert pdf_text(pdf) == "ind"

    def test_indirect_length_multidigit_object_id(self):
        """Regression: '/Length 12 0 R' must resolve via the indirect path —
        the old direct-length regex backtracked to the partial match '1'
        ((\\d+)='1' defeats the '\\s+\\d+\\s+R' lookahead) and silently
        truncated the stream, dropping the page text."""
        content = b"BT (indirect-big) Tj ET"
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: (b"<< /Length 12 0 R >>\nstream\n" + content
                + b"\nendstream"),
            12: b"%d" % len(content),
        }
        pdf = _mini_pdf(objs)
        assert pdf_text(pdf) == "indirect-big"

    def test_encrypt_mention_in_content_not_refused(self):
        """A readable PDF whose text *talks about* '/Encrypt 5 0 R' (a doc
        about PDF security) must not be refused as encrypted: the check is
        anchored to the trailer region."""
        objs = self._page_objs(b"BT (see /Encrypt 5 0 R usage) Tj ET")
        pdf = _mini_pdf(objs)
        r = scrape_pdf_result(pdf)
        assert r["ok"] is True and r["error"] is None
        assert "/Encrypt 5 0 R" in r["markdown"].replace("&#x2F;", "/") \
            or "Encrypt" in r["markdown"]

    def test_asciihex_filter_chain(self):
        content = b"BT (ahx) Tj ET"
        body = content.hex().encode() + b">"
        objs = self._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter [/ASCIIHexDecode] >>\nstream\n"
                   % len(body) + body + b"\nendstream")
        pdf = _mini_pdf(objs)
        assert pdf_text(pdf) == "ahx"

    def test_unknown_filter_skipped(self):
        objs = self._page_objs(b"\xff\xfe\x00")
        objs[4] = objs[4].replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")
        pdf = _mini_pdf(objs)
        assert pdf_text(pdf) == ""          # stream skipped, not misread
        assert pdf_metadata(pdf)[0] == 1    # page tree still parses

    def test_image_only_page_unsupported_refusal(self):
        """A 'scanned' PDF (every content stream DCT/JPX) must refuse with
        error=unsupported and the page count still extracted from the tree
        — not return ok with silently-empty text."""
        objs = self._page_objs(b"\xff\xd8\xff\xe0jpegdata")
        objs[4] = objs[4].replace(b"<< /Length",
                                  b"<< /Filter /DCTDecode /Length")
        r = scrape_pdf_result(_mini_pdf(objs))
        assert r["ok"] is False and r["error"] == "unsupported"
        assert r["num_pages"] == 1 and r["markdown"] == ""
        # partial documents stay best-effort ok: add a decodable 2nd page
        objs[5] = b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"
        objs[6] = b"<< /Length 15 >>\nstream\nBT (txt) Tj ET\nendstream"
        objs[2] = b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"
        r2 = scrape_pdf_result(_mini_pdf(objs))
        assert r2["ok"] is True and "txt" in r2["markdown"]

    def test_png_predictor_12_content_stream(self):
        """FlateDecode + /Predictor 12 (PNG Up) — the combination real-world
        xref/content streams use; the payload must round-trip through the
        un-predictor."""
        import zlib
        content = b"BT (predicted text) Tj ET"
        columns = 10
        # encode: rows of `columns` bytes, each prefixed by filter-type 2
        # (Up) and stored as delta vs the previous row
        padded = content + bytes((-len(content)) % columns)
        prev = bytes(columns)
        enc = bytearray()
        for i in range(0, len(padded), columns):
            row = padded[i:i + columns]
            enc.append(2)
            enc += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
            prev = row
        body = zlib.compress(bytes(enc))
        objs = self._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter /FlateDecode /DecodeParms "
                   b"<< /Predictor 12 /Columns %d >> >>\nstream\n"
                   % (len(body), columns) + body + b"\nendstream")
        assert pdf_text(_mini_pdf(objs)).rstrip("\x00") == "predicted text"

    def test_png_predictor_paeth_and_sub(self):
        """Predictors 11 (Sub) and 14 (Paeth) rows decode correctly."""
        import zlib
        content = b"BT (ps) Tj ET"
        columns = len(content)
        # one Sub row then one Paeth row over the same bytes: encode Sub
        row = content
        sub = bytearray([1])
        for j in range(columns):
            left = row[j - 1] if j >= 1 else 0
            sub.append((row[j] - left) & 0xFF)
        # Paeth with prev=row: predictor for j: a=left(decoded), b=up, c=up-left
        paeth = bytearray([4])
        dec = bytearray()
        for j in range(columns):
            a = dec[j - 1] if j >= 1 else 0
            b = row[j]
            c = row[j - 1] if j >= 1 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            dec.append(row[j])  # we want decoded == row again
            paeth.append((row[j] - pr) & 0xFF)
        body = zlib.compress(bytes(sub + paeth))
        objs = self._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter [/FlateDecode] /DecodeParms "
                   b"[<< /Predictor 11 /Columns %d >>] >>\nstream\n"
                   % (len(body), columns) + body + b"\nendstream")
        text = pdf_text(_mini_pdf(objs))
        # two identical decoded rows → the show-operator appears twice
        assert text == "ps\nps"

    def test_tiff_predictor_2(self):
        import zlib
        content = b"BT (tiff) Tj ET"
        columns = len(content)
        diff = bytearray([content[0]])
        for j in range(1, columns):
            diff.append((content[j] - content[j - 1]) & 0xFF)
        body = zlib.compress(bytes(diff))
        objs = self._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter /FlateDecode /DecodeParms "
                   b"<< /Predictor 2 /Columns %d >> >>\nstream\n"
                   % (len(body), columns) + body + b"\nendstream")
        assert pdf_text(_mini_pdf(objs)) == "tiff"

    def test_encrypted_refused(self):
        objs = self._page_objs(b"BT (sec) Tj ET")
        objs[5] = b"<< /V 2 /R 3 >>"
        pdf = _mini_pdf(objs, trailer_extra=b" /Encrypt 5 0 R")
        r = scrape_pdf_result(pdf)
        assert r["ok"] is False and r["error"] == "encrypted"
        assert r["markdown"] == ""

    def test_encrypted_with_trailing_junk_trailer_still_refused(self):
        """A crafted document with the bare bytes 'trailer' in junk AFTER
        the real trailer must not shrink the /Encrypt scan region and fail
        the check open: the scan anchors on 'trailer <<' dicts, not the
        last occurrence of the word."""
        objs = self._page_objs(b"BT (sec) Tj ET")
        objs[5] = b"<< /V 2 /R 3 >>"
        pdf = _mini_pdf(objs, trailer_extra=b" /Encrypt 5 0 R")
        crafted = pdf + b"\n% junk mentioning trailer keyword only\n"
        r = scrape_pdf_result(crafted)
        assert r["ok"] is False and r["error"] == "encrypted"

    def test_bare_trailer_word_in_junk_not_refused(self):
        """Symmetric fail-safe: a clean doc with 'trailer' in trailing junk
        (no dict, no /Encrypt) parses normally."""
        objs = self._page_objs(b"BT (clean) Tj ET")
        pdf = _mini_pdf(objs) + b"\n% trailer\n"
        r = scrape_pdf_result(pdf)
        assert r["ok"] is True and r["error"] is None

    def test_truncated_xref_still_parses(self):
        """Scanning indexer: chopping the xref table + trailer off leaves
        the objects readable (lopdf-style recovery)."""
        pdf = build_pdf(["alpha", "beta"], title="T")
        truncated = pdf[:pdf.rfind(b"xref")]
        assert pdf_text(truncated) == "alpha\nbeta"
        assert pdf_metadata(truncated)[0] == 1
        # /Root is gone with the trailer → document-order fallback found
        # the page; scrape still succeeds
        assert scrape_pdf_result(truncated)["ok"] is True

    def test_bad_stream_length_recovers_or_refuses(self):
        """A /Length longer than the file must not crash or hang."""
        objs = self._page_objs(b"BT (x) Tj ET")
        objs[4] = objs[4].replace(b"/Length 12", b"/Length 99999")
        pdf = _mini_pdf(objs)
        r = scrape_pdf_result(pdf)
        assert r["error"] in (None, "no_pages", "parse_error")

    def test_taxonomy_values(self):
        assert scrape_pdf_result(None)["error"] == "empty"
        assert scrape_pdf_result(b"")["error"] == "empty"
        assert scrape_pdf_result(b"<html>nope</html>")["error"] == "not_pdf"
        assert scrape_pdf_result(b"%PDF-1.4 no objects")["error"] == "no_pages"
        ok = scrape_pdf_result(build_pdf(["x"], title="t"))
        assert ok["ok"] is True and ok["error"] is None


def _cumoffsets(bodies: list[bytes]) -> list[int]:
    """Offsets of space-joined bodies within the ObjStm payload tail."""
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    return offs


class TestFontDecoding:
    """Font-resolved text decode (pdf.rs/pdf-parse resolve text through the
    page's font resources): ToUnicode CMaps (bfchar + bfrange), Type0
    2-byte CID codes, /Encoding /Differences glyph names."""

    def test_cid_tounicode_roundtrip(self):
        from webcrawl_spark.kernels.pdfkit import build_pdf_fonts, pdf_text

        fx = build_pdf_fonts("H\u00e9llo \u2014 w\u00f6rld",
                             b"plain", b"200 /bullet")
        assert pdf_text(fx).split("\n")[0] == "H\u00e9llo \u2014 w\u00f6rld"

    def test_differences_glyph_names(self):
        from webcrawl_spark.kernels.pdfkit import build_pdf_fonts, pdf_text

        fx = build_pdf_fonts("x", b"b:\x41 e:\x42 q:\x43",
                             b"65 /bullet 66 /Euro 67 /quotedblleft")
        assert pdf_text(fx).split("\n")[1] == \
            "b:\u2022 e:\u20ac q:\u201c"

    def test_differences_uni_names_and_unknown_dropped(self):
        from webcrawl_spark.kernels.pdfkit import build_pdf_fonts, pdf_text

        fx = build_pdf_fonts("x", b"a\x41b\x42c",
                             b"65 /uni2603 66 /glyph99999")
        assert pdf_text(fx).split("\n")[1] == "a\u2603bc"

    def test_untouched_codes_fall_back_to_base_encoding(self):
        from webcrawl_spark.kernels.pdfkit import build_pdf_fonts, pdf_text

        fx = build_pdf_fonts("x", b"keep ascii \x41", b"65 /bullet")
        assert pdf_text(fx).split("\n")[1] == "keep ascii \u2022"

    def test_unmapped_cid_dropped(self):
        from webcrawl_spark.kernels.pdfkit import (build_pdf_fonts,
                                                   pdf_text)

        # map only 'A' (0x0041); append an unmapped code 0x0999 by hand
        fx = build_pdf_fonts("A", b"p", b"65 /bullet")
        fx = fx.replace(b"<0041> Tj", b"<00410999> Tj")
        assert pdf_text(fx).split("\n")[0] == "A"

    def test_plain_writer_has_no_font_decoding(self):
        """build_pdf's simple Type1 font carries no ToUnicode/Differences;
        extraction must take the raw-string path (oracle stability)."""
        from webcrawl_spark.kernels.pdfkit import build_pdf, pdf_text

        d = build_pdf(["abc", "caf\u00e9"])
        assert pdf_text(d) == "abc\ncaf\u00e9"


class TestSparkOperator:
    def test_scrape_pdfs_matches_kernel(self, spark):
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.pdf import (
            build_pdf_udf, pdf_lines_col, scrape_pdfs,
        )

        rows = [(i, f"doc body {i} " * (20 * (i + 1))) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        pdfs = df.select(
            "doc_id", "text",
            build_pdf_udf(40)(
                pdf_lines_col(F.col("text"), 50),
                F.concat(F.lit("t-"), F.col("doc_id").cast("string")),
            ).alias("payload"),
        )
        out = scrape_pdfs(pdfs, timeout_ms=60000).collect()
        for r in out:
            text = r["text"]
            lines = [text[i:i + 50] for i in range(0, max(1, len(text)), 50)]
            expected = scrape_pdf_result(
                build_pdf(lines, f"t-{r['doc_id']}"), timeout_ms=60000)
            assert r["pdf"]["ok"]
            assert r["pdf"]["num_pages"] == expected["num_pages"]
            assert r["pdf"]["title"] == f"t-{r['doc_id']}"
            assert r["pdf"]["markdown"] == expected["markdown"]

    def test_engine_routing_to_pdf(self, spark):
        """S5: .pdf URLs route to the pdf engine choice."""
        from pyspark.sql import functions as F

        from webcrawl_spark.functions import engine_choice_col

        df = spark.createDataFrame(
            [("https://a.com/x.pdf",), ("https://a.com/x.PDF?q=1",),
             ("https://a.com/x.html",), ("https://a.com/doc.docx",)],
            "url string",
        )
        rows = df.select("url", engine_choice_col(F.col("url")).alias("e")) \
                 .collect()
        assert [r["e"] for r in rows] == ["pdf", "pdf", "fetch", "document"]


def _lzw_encode(data: bytes, early: int = 1,
                clear_every: int | None = None) -> bytes:
    """Reference PDF-LZW compressor (MSB packing, width schedule mirrored
    from the spec's EarlyChange semantics) — test-side inverse of
    lzw_decode."""
    emitted = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            emitted.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    emit(256)
    cur = b""
    count = 0
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        count += 1
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 + early >= (1 << width) and width < 12:
            width += 1
        cur = bytes([b])
        if clear_every and count % clear_every == 0:
            emit(256)
            table, next_code, width = fresh(), 258, 9
    if cur:
        emit(table[cur])
    emit(257)
    if nbits:
        emitted.append((acc << (8 - nbits)) & 0xFF)
    return bytes(emitted)


class TestLzw:
    """PDF 7.4.4 LZWDecode (r4 verdict #6): the table decoder feeding the
    existing predictor path."""

    def test_roundtrip_both_early_changes(self):
        import random

        from webcrawl_spark.kernels.pdfkit import lzw_decode

        rng = random.Random(99)
        # limited alphabet + length crosses the 9->10->11 width boundaries
        data = bytes(rng.randrange(16) + 65 for _ in range(4000))
        for early in (0, 1):
            assert lzw_decode(_lzw_encode(data, early=early),
                              early_change=early) == data

    def test_kwkwk_and_runs(self):
        from webcrawl_spark.kernels.pdfkit import lzw_decode

        for data in (b"aaaaaaaaaaaa", b"abababababab", b"x"):
            assert lzw_decode(_lzw_encode(data)) == data

    def test_midstream_clear_codes(self):
        from webcrawl_spark.kernels.pdfkit import lzw_decode

        data = bytes((i * 7) % 256 for i in range(3000))
        enc = _lzw_encode(data, clear_every=100)
        assert lzw_decode(enc) == data

    def test_lzw_content_stream(self):
        content = b"BT (lzw text layer) Tj ET"
        body = _lzw_encode(content)
        objs = TestRealWorldStructures()._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter /LZWDecode >>\nstream\n"
                   % len(body) + body + b"\nendstream")
        assert pdf_text(_mini_pdf(objs)) == "lzw text layer"

    def test_lzw_with_png_predictor(self):
        """Adversarial combination: PNG Up predictor rows, LZW-compressed,
        with an explicit /EarlyChange 0 parm."""
        content = b"BT (lzw predicted) Tj ET"
        columns = 8
        padded = content + bytes((-len(content)) % columns)
        prev = bytes(columns)
        enc = bytearray()
        for i in range(0, len(padded), columns):
            row = padded[i:i + columns]
            enc.append(2)
            enc += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
            prev = row
        body = _lzw_encode(bytes(enc), early=0)
        objs = TestRealWorldStructures()._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter /LZWDecode /DecodeParms "
                   b"<< /Predictor 12 /Columns %d /EarlyChange 0 >> "
                   b">>\nstream\n" % (len(body), columns)
                   + body + b"\nendstream")
        assert pdf_text(_mini_pdf(objs)).rstrip("\x00") == "lzw predicted"

    def test_flate_then_lzw_chain(self):
        """Filter arrays apply in order — [/ASCIIHexDecode /LZWDecode]."""
        content = b"BT (chained) Tj ET"
        lzw = _lzw_encode(content)
        body = lzw.hex().encode() + b">"
        objs = TestRealWorldStructures()._page_objs(b"")
        objs[4] = (b"<< /Length %d /Filter [/ASCIIHexDecode /LZWDecode] "
                   b">>\nstream\n" % len(body) + body + b"\nendstream")
        assert pdf_text(_mini_pdf(objs)) == "chained"

    def test_corrupt_lzw_same_taxonomy_as_corrupt_flate(self):
        """A corrupt LZW stream behaves exactly like a corrupt Flate
        stream: best-effort empty text, never a crash or misread."""
        objs = TestRealWorldStructures()._page_objs(b"")
        body = b"\xff\xff\xff\xff\xff\xff"
        objs[4] = (b"<< /Length %d /Filter /LZWDecode >>\nstream\n"
                   % len(body) + body + b"\nendstream")
        r = scrape_pdf_result(_mini_pdf(objs))
        assert r["markdown"] == "" and r["num_pages"] == 1
        assert r["error"] is None  # decode failure ≠ unsupported filter
