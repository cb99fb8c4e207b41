"""Minimal-PDF extraction kernel tests (X4/U4 subset)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from searchgov_spider_spark.kernels import pdfx


class TestPdfKernel:
    def test_roundtrip_compressed(self):
        pdf = pdfx.make_simple_pdf(["Hello PDF world.", "Second line here."])
        doc = pdfx.extract_pdf_text(pdf)
        assert doc.text == "Hello PDF world. Second line here."
        assert doc.n_streams == 1

    def test_roundtrip_uncompressed(self):
        pdf = pdfx.make_simple_pdf(["Plain stream text"], compress=False)
        assert pdfx.extract_pdf_text(pdf).text == "Plain stream text"

    def test_escapes(self):
        pdf = pdfx.make_simple_pdf(["Parens (nested) and back\\slash"])
        assert pdfx.extract_pdf_text(pdf).text == "Parens (nested) and back\\slash"

    def test_annot_and_text_links_union(self):
        pdf = pdfx.make_simple_pdf(
            ["See https://example.gov/visible for details."],
            annot_uris=["https://example.gov/annot", "https://example.gov/visible"],
        )
        doc = pdfx.extract_pdf_text(pdf)
        # annots first, then visible-text urls, deduped (parse.py:214-252)
        assert doc.links == ["https://example.gov/annot", "https://example.gov/visible"]

    def test_not_a_pdf(self):
        doc = pdfx.extract_pdf_text(b"<html>nope</html>")
        assert doc.text == "" and doc.links == [] and doc.n_streams == 0

    def test_corrupt_stream_tolerated(self):
        pdf = pdfx.make_simple_pdf(["good text"])
        corrupted = pdf.replace(b"stream\n", b"stream\n\x00\x01", 1)
        doc = pdfx.extract_pdf_text(corrupted)  # no crash
        assert isinstance(doc.text, str)

    def test_tj_array_operator(self):
        content = b"BT [(Hello) -250 (World)] TJ ET"
        pdf = (
            b"%PDF-1.4\n4 0 obj\n<< /Length "
            + str(len(content)).encode()
            + b" >>\nstream\n"
            + content
            + b"\nendstream\nendobj\n%%EOF"
        )
        assert pdfx.extract_pdf_text(pdf).text == "Hello World"


class TestStreamFilters:
    """Codec breadth (X4, reference indexing/parse.py:113-252 via pypdf):
    LZW, ASCIIHex, ASCII85, filter chains, TJ kerning arrays."""

    PAYLOADS = [b"", b"a", b"ababababab" * 40, bytes(range(256)) * 3, b"\x00\xff" * 100]

    def test_lzw_roundtrip(self):
        for p in self.PAYLOADS:
            assert pdfx.lzw_decode(pdfx.lzw_encode(p)) == p

    def test_lzw_table_growth_across_width_boundary(self):
        # >253 distinct new sequences forces the 9->10 bit early change
        p = bytes(i % 251 for i in range(4000))
        assert pdfx.lzw_decode(pdfx.lzw_encode(p)) == p

    def test_ascii_hex(self):
        assert pdfx.ascii_hex_decode(b"48656C6C 6F>garbage") == b"Hello"
        assert pdfx.ascii_hex_decode(b"48656C6C6F2") == b"Hello "  # odd pad -> 0x20

    def test_ascii85(self):
        import base64

        raw = b"hello \x00\x00\x00\x00 world"
        enc = base64.a85encode(raw) + b"~>"
        assert pdfx.ascii85_decode(enc) == raw
        assert pdfx.ascii85_decode(b"<~" + base64.a85encode(raw) + b"~>") == raw

    def test_each_filter_end_to_end(self):
        lines = ["Filtered body text.", "See https://h.gov/x now."]
        for filters in ([], ["FlateDecode"], ["LZWDecode"], ["ASCIIHexDecode"],
                        ["ASCII85Decode"], ["ASCII85Decode", "FlateDecode"],
                        ["ASCIIHexDecode", "LZWDecode"]):
            pdf = pdfx.make_simple_pdf(lines, filters=filters)
            doc = pdfx.extract_pdf_text(pdf)
            assert doc.text == "Filtered body text. See https://h.gov/x now.", filters
            assert doc.links == ["https://h.gov/x"], filters

    def test_unsupported_filter_skips_stream(self):
        pdf = pdfx.make_simple_pdf(["text"], filters=[])
        broken = pdf.replace(b"/Length", b"/Filter /RunLengthDecode /Length", 1)
        doc = pdfx.extract_pdf_text(broken)  # no crash, stream skipped
        assert doc.text == ""

    def test_png_predictor_roundtrip_all_filter_types(self):
        data = bytes((i * 37 + (i >> 3)) & 0xFF for i in range(317))
        for ftype in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4]):
            enc = pdfx.png_predictor_encode(data, ftype, columns=16)
            dec = pdfx.apply_png_predictor(enc, columns=16)
            # encoder zero-pads the final partial row
            assert dec[: len(data)] == data and set(dec[len(data):]) <= {0}, ftype

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=600),
        ftype=st.one_of(st.integers(0, 4), st.lists(st.integers(0, 4), min_size=1, max_size=5)),
        columns=st.integers(1, 40),
    )
    def test_png_predictor_roundtrip_property(self, data, ftype, columns):
        """Property: decode(encode(x)) == x (mod row zero-padding) for every
        filter type / per-row cycle / column width over arbitrary bytes."""
        enc = pdfx.png_predictor_encode(data, ftype, columns=columns)
        dec = pdfx.apply_png_predictor(enc, columns=columns)
        assert dec[: len(data)] == data
        assert set(dec[len(data):]) <= {0}

    def test_tiff_predictor(self):
        raw = bytes((i * 11) & 0xFF for i in range(40))
        enc = bytearray(raw)
        for start in range(0, 40, 8):  # forward horizontal differencing
            for i in range(min(start + 8, 40) - 1, start, -1):
                enc[i] = (enc[i] - enc[i - 1]) & 0xFF
        assert pdfx.apply_tiff_predictor(bytes(enc), columns=8) == raw

    def test_decode_parms_parsing(self):
        assert pdfx.stream_decode_parms(b"/Filter /FlateDecode") == []
        assert pdfx.stream_decode_parms(
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >>"
        ) == [b" /Predictor 12 /Columns 5 "]
        parms = pdfx.stream_decode_parms(
            b"/Filter [/ASCII85Decode /FlateDecode] /DecodeParms [null << /Predictor 12 >>]"
        )
        assert parms[0] == b"" and b"Predictor 12" in parms[1]

    def test_predictor_end_to_end(self):
        """DecodeParms predictors (PDF §7.4.4.4) over Flate and LZW content
        streams — 10-14 fixed row filters, 15 per-row optimum, TIFF 2."""
        for pred in (10, 11, 12, 13, 14, 15):
            pdf = pdfx.make_simple_pdf(
                [f"Pred {pred} body.", "See https://h.gov/p now."],
                predictor=pred, predictor_columns=7,
            )
            doc = pdfx.extract_pdf_text(pdf)
            assert doc.text == f"Pred {pred} body. See https://h.gov/p now.", pred
        pdf = pdfx.make_simple_pdf(["LZW pred."], filters=["LZWDecode"], predictor=12)
        assert pdfx.extract_pdf_text(pdf).text == "LZW pred."
        # chain: predictor pairs with the FINAL decode filter, null for A85
        pdf = pdfx.make_simple_pdf(
            ["Chain pred."], filters=["ASCII85Decode", "FlateDecode"], predictor=12
        )
        assert pdfx.extract_pdf_text(pdf).text == "Chain pred."

    def test_xref_stream_layout(self):
        """PDF 1.5 cross-reference stream: text/links/meta extract through
        the xref-stream layout, the /Info ref resolves from the XRef stream
        dict, and the decoded W=[1 2 2] rows point at the real objects."""
        pdf = pdfx.make_simple_pdf(
            ["Xref stream text."],
            annot_uris=["https://a.gov/ann"],
            info={"Title": "XT", "CreationDate": "D:20240101120000Z00'00'"},
            xref_stream=True,
        )
        assert pdf.startswith(b"%PDF-1.5")
        doc = pdfx.extract_pdf_text(pdf)
        assert doc.text == "Xref stream text."
        assert doc.links == ["https://a.gov/ann"]
        assert pdfx.extract_pdf_meta(pdf).get("Title") == "XT"
        assert doc.n_streams == 2  # content + the xref stream itself
        # decode the xref stream rows (Predictor 12) and verify offsets
        m = list(pdfx._STREAM_RE.finditer(pdf))[-1]
        rows = pdfx.decode_stream(m.group(1), m.group(2))
        assert len(rows) % 5 == 0
        live = 0
        for n in range(len(rows) // 5):
            typ = rows[n * 5]
            off = int.from_bytes(rows[n * 5 + 1 : n * 5 + 3], "big")
            if typ == 1:
                assert pdf[off : off + 12].startswith(f"{n} ".encode()), n
                live += 1
        assert live >= 5  # catalog, pages, page, contents, annot(s)/info/xref

    def test_object_stream_layout(self):
        """PDF 1.5 object streams (§7.5.7): annot /URI actions and the
        /Info dict compressed inside a /Type /ObjStm container must extract
        identically to the classic layout — links annot-first, Info via the
        type-2 xref entry chain."""
        kwargs = dict(
            annot_uris=["https://a.gov/ann1", "https://a.gov/ann2"],
            info={"Title": "Compressed Info", "CreationDate": "D:20240101120000Z00'00'"},
        )
        classic = pdfx.make_simple_pdf(["Body.", "See https://x.gov/p ."], **kwargs)
        objstm = pdfx.make_simple_pdf(
            ["Body.", "See https://x.gov/p ."], xref_stream=True, obj_stream=True, **kwargs
        )
        # really compressed: URIs/Title absent from the raw bytes
        assert b"ann1" in classic and b"ann1" not in objstm
        assert b"Compressed Info" not in objstm
        dc, do = pdfx.extract_pdf_text(classic), pdfx.extract_pdf_text(objstm)
        assert do.text == dc.text == "Body. See https://x.gov/p ."
        assert do.links == dc.links == [
            "https://a.gov/ann1", "https://a.gov/ann2", "https://x.gov/p"]
        assert pdfx.extract_pdf_meta(objstm) == pdfx.extract_pdf_meta(classic)
        # expand_object_streams sees all three embedded objects with indices
        embedded = pdfx.expand_object_streams(objstm)
        assert [(n, i) for n, i, _d in embedded] == [(5, 0), (6, 1), (7, 2)]
        # the xref stream carries matching type-2 entries
        m = [mm for mm in pdfx._STREAM_RE.finditer(objstm) if b"/XRef" in mm.group(1)][0]
        rows = pdfx.decode_stream(m.group(1), m.group(2))
        t2 = [
            (rows[i * 5], int.from_bytes(rows[i * 5 + 3 : i * 5 + 5], "big"))
            for i in range(len(rows) // 5)
            if rows[i * 5] == 2
        ]
        assert t2 == [(2, 0), (2, 1), (2, 2)]

    def test_tounicode_cmap_hex_strings(self):
        """Composite-font hex show-strings decode through /ToUnicode CMaps
        (bfchar + bfrange, 2-byte codes); the fixture's private-use code
        offset means a byte-fallback cannot silently pass."""
        pdf = pdfx.make_simple_pdf(
            ["Literal line."],
            hex_text_lines=["Hello CMap world!", "abcdefg 0123"],
            annot_uris=["https://a.gov/x"],
        )
        doc = pdfx.extract_pdf_text(pdf)
        assert doc.text == "Literal line. Hello CMap world! abcdefg 0123"
        cmaps = pdfx.parse_tounicode_cmaps(pdf)
        assert len(cmaps) == 1 and cmaps[0][0] == 2
        assert cmaps[0][1][0xE000 + ord("H")] == "H"
        # digit run 0123 + letter run abcdefg come from bfrange entries
        assert all(0xE000 + ord(c) in cmaps[0][1] for c in "abcdefg0123")

    def test_hex_string_fallback_and_tj_arrays(self):
        # no CMap: simple-font hex strings fall back to latin-1 bytes
        raw = (b"%PDF-1.4\n4 0 obj\n<< /Length 44 >>\nstream\n"
               b"BT <48656C6C6F> Tj (lit) Tj ET\nendstream\nendobj\n%%EOF")
        assert pdfx.extract_pdf_text(raw).text == "Hello lit"
        # hex pieces inside TJ kerning arrays
        raw = (b"%PDF-1.4\n4 0 obj\n<< /Length 60 >>\nstream\n"
               b"BT [<4865> -300 <6C6C6F>] TJ ET\nendstream\nendobj\n%%EOF")
        assert pdfx.extract_pdf_text(raw).text == "He llo"

    def test_malformed_cmap_degrades_never_crashes(self):
        """Review findings: odd-length hex destinations and bfrange bases
        walking past their byte width (sloppy real-world writers) must not
        raise out of extract_pdf_text — one bad crawled PDF must not fail a
        Spark task.  Well-formed entries in the same CMap still apply."""
        bad_cmap = (
            b"begincmap 1 begincodespacerange <0000> <FFFF> endcodespacerange "
            b"2 beginbfchar <0041> <414> <0042> <0042> endbfchar "  # odd-length dst
            b"1 beginbfrange <0050> <0060> <FF> endbfrange "  # 1-byte base overflows
            b"endcmap"
        )
        pdf = (
            b"%PDF-1.4\n5 0 obj\n<< /Length " + str(len(bad_cmap)).encode()
            + b" >>\nstream\n" + bad_cmap + b"\nendstream\nendobj\n"
            b"4 0 obj\n<< /Length 30 >>\nstream\nBT <0042> Tj (lit) Tj ET\nendstream\nendobj\n%%EOF"
        )
        doc = pdfx.extract_pdf_text(pdf)  # must not raise
        assert "lit" in doc.text
        assert "B" in doc.text  # the well-formed <0042> -> B mapping survived

    def test_content_mentioning_begincmap_keeps_its_text(self):
        """A page whose VISIBLE text mentions 'begincmap beginbfchar' (a PDF
        about PDFs) must not be misclassified as a CMap stream and dropped —
        classification requires structure AND no show-text operators."""
        content = b"BT (How begincmap and beginbfchar sections work) Tj ET"
        pdf = (b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode()
               + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
        assert pdfx.extract_pdf_text(pdf).text == "How begincmap and beginbfchar sections work"

    def test_cmap_composes_with_xref_and_object_streams(self):
        pdf = pdfx.make_simple_pdf(
            [], hex_text_lines=["Xref hex body."], info={"Title": "HX"},
            annot_uris=["https://a.gov/y"], xref_stream=True, obj_stream=True,
        )
        assert pdfx.extract_pdf_text(pdf).text == "Xref hex body."
        assert pdfx.extract_pdf_meta(pdf)["Title"] == "HX"
        assert pdfx.extract_pdf_text(pdf).links[0] == "https://a.gov/y"

    def test_tj_kerning_semantics(self):
        # small kern concatenates, large kern reads as a word gap
        pdf = pdfx.make_simple_pdf([], tj_arrays=[["Hel", -30.0, "lo"], ["wor", -250.0, "ld"]])
        assert pdfx.extract_pdf_text(pdf).text == "Hello wor ld"

    def test_tj_and_tj_ops_keep_stream_order(self):
        content = b"BT (first) Tj [(sec) -40 (ond)] TJ (third) Tj ET"
        pdf = (b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode()
               + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
        assert pdfx.extract_pdf_text(pdf).text == "first second third"


class TestPdfMetadata:
    def test_info_dict_roundtrip(self):
        from searchgov_spider_spark.kernels import pdfx

        pdf = pdfx.make_simple_pdf(
            ["Body text."],
            info={"Title": "My (Report)", "CreationDate": "D:20240115120000Z00'00'",
                  "ModDate": "D:20240216080000-04'00'"},
        )
        meta = pdfx.extract_pdf_meta(pdf)
        assert meta["Title"] == "My (Report)"
        assert meta["CreationDate"].startswith("D:20240115")

    def test_convert_pdf_fields(self):
        from searchgov_spider_spark.kernels import pdfx

        url = "https://h.gov/files/BudgetSummary2024.pdf"
        pdf = pdfx.make_simple_pdf(
            ["Spending rose.", "See https://h.gov/data for tables."],
            annot_uris=["https://h.gov/annot"],
            info={"Title": "Budget Summary", "CreationDate": "D:20240101090000",
                  "SourceModified": "D:20240301100000"},
        )
        doc = pdfx.convert_pdf(pdf, url)
        assert doc["title"] == "Budget Summary"
        # content prepend: title_separated + filename + text + links (X15)
        assert doc["content"].startswith("Budget Summary BudgetSummary2024.pdf Spending rose.")
        assert "https://h.gov/annot" in doc["content"]
        assert doc["created_at"] == "2024-01-01T09:00:00"
        assert doc["changed"] == "2024-03-01T10:00:00"  # ModDate missing -> SourceModified
        assert doc["updated"] == "2024-01-01T09:00:00"

    def test_convert_pdf_filename_fallback(self):
        from searchgov_spider_spark.kernels import pdfx

        url = "https://h.gov/files/AnnualReport2024.pdf"
        pdf = pdfx.make_simple_pdf(["Text."])
        doc = pdfx.convert_pdf(pdf, url)
        # title = filename stem (get_title_from_filename), content prepend
        # uses the SEPARATED words (transform.py:140-142)
        assert doc["title"] == "AnnualReport2024"
        assert doc["content"].startswith("Annual Report 2024 AnnualReport2024.pdf Text.")
        assert doc["created_at"] is None and doc["changed"] is None


class TestSimpleFontEncodings:
    """PDF §9.6.6 /Encoding /Differences + per-font decode association
    (reference breadth via pypdf, indexing/parse.py:113-252)."""

    def test_differences_remap_requires_encoding_table(self):
        from searchgov_spider_spark.kernels import pdfx

        pdf = pdfx.make_simple_pdf(["Plain line."], diff_text_lines=["café — résumé"])
        assert pdfx.extract_pdf_text(pdf).text == "Plain line. café — résumé"
        # the show-string bytes are code 0x21+ — a naive latin-1 reader
        # would emit punctuation garbage, so passing proves the table ran
        raw_codes = "".join(chr(0x21 + i) for i in range(5))
        assert raw_codes not in pdfx.extract_pdf_text(pdf).text

    def test_differences_compose_with_xref_objstm_and_cmap(self):
        from searchgov_spider_spark.kernels import pdfx

        pdf = pdfx.make_simple_pdf(
            ["A."], hex_text_lines=["HexPart"], diff_text_lines=["équité"],
            annot_uris=["https://x.gov/a"], info={"Title": "T"},
        )
        doc = pdfx.extract_pdf_text(pdf)
        assert doc.text == "A. HexPart équité"
        assert doc.links == ["https://x.gov/a"]
        pdf2 = pdfx.make_simple_pdf(
            ["A."], diff_text_lines=["über"], xref_stream=True, obj_stream=True,
            info={"Title": "T"}, annot_uris=["https://y.gov/b"],
        )
        assert pdfx.extract_pdf_text(pdf2).text == "A. über"

    def test_winansi_base_encoding_decodes_80_9f(self):
        """Bytes 0x80-0x9F through a /BaseEncoding /WinAnsiEncoding font are
        cp1252 smart quotes / euro, NOT latin-1 control chars."""
        from searchgov_spider_spark.kernels import pdfx

        body = (
            b"%PDF-1.4\n"
            b"3 0 obj\n<< /Type /Page /Resources << /Font << /FW 7 0 R >> >> >>\nendobj\n"
            b"7 0 obj\n<< /Type /Font /Subtype /Type1 /Encoding << /Type /Encoding "
            b"/BaseEncoding /WinAnsiEncoding >> >>\nendobj\n"
            b"4 0 obj\n<< /Length 44 >>\nstream\n"
            b"BT /FW 12 Tf (\\200 \\223quoted\\224 \\226) Tj ET\nendstream\nendobj\n"
        )
        assert pdfx.extract_pdf_text(body).text == "€ “quoted” –"

    def test_per_font_cmap_association(self):
        """Two composite fonts with overlapping code ranges: each hex string
        decodes through ITS font's /ToUnicode CMap (selected by Tf), never
        the other font's mapping (round-4 ADVICE: the document-global
        best-fraction heuristic could let the wrong CMap win)."""
        import zlib

        from searchgov_spider_spark.kernels import pdfx

        def cmap_stream(objnum, pairs):
            text = (
                "begincmap 1 begincodespacerange <0000> <FFFF> endcodespacerange "
                + f"{len(pairs)} beginbfchar "
                + " ".join(f"<{src:04X}> <{ord(dst):04X}>" for src, dst in pairs)
                + " endbfchar endcmap"
            ).encode()
            data = zlib.compress(text)
            return (
                f"{objnum} 0 obj\n<< /Filter /FlateDecode /Length {len(data)} >>\nstream\n".encode()
                + data + b"\nendstream\nendobj\n"
            )

        # code 0x0001 means "A" in font X's CMap but "Z" in font Y's
        body = (
            b"%PDF-1.4\n"
            b"3 0 obj\n<< /Type /Page /Resources << /Font << /FX 10 0 R /FY 11 0 R >> >> >>\nendobj\n"
            b"10 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 20 0 R >>\nendobj\n"
            b"11 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 21 0 R >>\nendobj\n"
            + cmap_stream(20, [(1, "A"), (2, "B")])
            + cmap_stream(21, [(1, "Z"), (2, "Y")])
            + b"4 0 obj\n<< /Length 60 >>\nstream\n"
            b"BT /FX 12 Tf <00010002> Tj /FY 12 Tf <00010002> Tj ET\nendstream\nendobj\n"
        )
        assert pdfx.extract_pdf_text(body).text == "AB ZY"

    def test_unknown_glyph_names_drop_not_garble(self):
        from searchgov_spider_spark.kernels import pdfx

        body = (
            b"%PDF-1.4\n"
            b"3 0 obj\n<< /Type /Page /Resources << /Font << /FS 7 0 R >> >> >>\nendobj\n"
            b"7 0 obj\n<< /Type /Font /Subtype /Type1 /Encoding << /Differences "
            b"[33 /g42 /eacute /cid77] >> >>\nendobj\n"
            b"4 0 obj\n<< /Length 40 >>\nstream\n"
            b"BT /FS 12 Tf (\\041\\042\\043) Tj ET\nendstream\nendobj\n"
        )
        # g42 and cid77 carry no unicode semantics -> dropped; eacute maps
        assert pdfx.extract_pdf_text(body).text == "é"

    def test_glyph_name_conventions(self):
        from searchgov_spider_spark.kernels.pdfx import glyph_to_unicode

        assert glyph_to_unicode("eacute") == "é"
        assert glyph_to_unicode("Euro") == "€"
        assert glyph_to_unicode("a") == "a"
        assert glyph_to_unicode("uni20AC") == "€"
        assert glyph_to_unicode("u0041") == "A"
        assert glyph_to_unicode("g123") is None
        assert glyph_to_unicode("cid42") is None


class TestDecodeParmsAlignment:
    """Round-4 ADVICE: nested arrays/dicts inside /DecodeParms entries must
    not misalign the per-filter parms list."""

    def test_nested_tokens_keep_alignment(self):
        from searchgov_spider_spark.kernels.pdfx import stream_decode_parms

        d = (b"/Filter [/ASCII85Decode /FlateDecode] "
             b"/DecodeParms [null << /Predictor 12 /Columns 16 "
             b"/Nested [1 2 3] /Sub << /X 1 >> >>]")
        parms = stream_decode_parms(d)
        assert len(parms) == 2
        assert parms[0] == b""
        assert b"/Predictor 12" in parms[1] and b"/Sub" in parms[1]

    def test_count_mismatch_skips_predictors(self):
        """A two-entry parms array against one filter: applying either entry
        positionally could corrupt the stream — decode_stream must skip
        predictor application and return the plain inflate."""
        import zlib

        from searchgov_spider_spark.kernels.pdfx import decode_stream

        raw = b"BT (hello) Tj ET"
        d = (b"/Filter /FlateDecode "
             b"/DecodeParms [<< /Predictor 12 /Columns 4 >> << /Predictor 11 /Columns 2 >>]")
        assert decode_stream(d, zlib.compress(raw)) == raw

    def test_single_dict_with_nested_array_still_applies(self):
        import zlib

        from searchgov_spider_spark.kernels.pdfx import decode_stream, png_predictor_encode

        raw = b"0123456789abcdef" * 8
        enc = zlib.compress(png_predictor_encode(raw, 2, columns=16))
        d = (b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 "
             b"/Nested [9 8] >>")
        assert decode_stream(d, enc) == raw
