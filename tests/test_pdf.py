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
