"""Minimal-PDF extraction kernel tests (X4/U4 subset)."""

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
