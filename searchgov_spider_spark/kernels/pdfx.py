"""Minimal PDF text/link extraction kernel (SURVEY.md §2.9 X4, §2.6 U4).

The reference extracts PDF text with pypdf per page joined with " ", pulls
links from visible text regex plus /Annots URI actions, and prepends
title+filename (indexing/parse.py:113-252, transform.py:120-195).  pypdf is
unavailable in this environment; this module implements the same *shape* for
the well-formed subset our fixtures generate: classic (non-object-stream)
PDFs whose page content streams are plain or FlateDecode-compressed and
whose text uses the standard Tj / TJ / ' operators with literal strings.

Real-world PDFs are far messier (encodings, CMaps, object streams); this is
explicitly a subset implementation — the UDF surface, fixture builder and
field semantics are real, the codec breadth is not.  A production deployment
swaps `extract_pdf_text` for a pypdf call with identical outputs.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]])*)\]\s*TJ")
_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_URI_RE = re.compile(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)")
_TEXT_URL_RE = re.compile(r"https?://[^\s<>\")\]]+")

_ESCAPES = {b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}


def _unescape(raw: bytes) -> str:
    for esc, repl in _ESCAPES.items():
        raw = raw.replace(esc, repl)
    raw = re.sub(rb"\\([0-7]{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), raw)
    return raw.decode("latin-1")


@dataclass
class PdfDoc:
    text: str = ""
    links: list[str] = field(default_factory=list)
    n_streams: int = 0


def extract_pdf_text(body: bytes) -> PdfDoc:
    """Text + links from a simple PDF (see module doc for subset limits).

    Text fragments per content stream are joined with spaces, streams joined
    with " " (the reference joins pages with " ", parse.py:113-151).  Links =
    /Annots URI actions ∪ URLs matched in visible text, first-seen order,
    deduplicated (parse.py:214-252 get_pdf_links).
    """
    out = PdfDoc()
    if not body.startswith(b"%PDF"):
        return out
    parts: list[str] = []
    for dict_part, stream in _STREAM_RE.findall(body):
        out.n_streams += 1
        data = stream
        if b"FlateDecode" in dict_part:
            try:
                data = zlib.decompress(stream)
            except zlib.error:
                continue
        frags = [_unescape(m) for m in _TJ_RE.findall(data)]
        for arr in _TJ_ARRAY_RE.findall(data):
            frags.extend(_unescape(m) for m in _ARRAY_STR_RE.findall(arr))
        if frags:
            parts.append(" ".join(frags))
    out.text = " ".join(p for p in parts if p).strip()

    seen: set[str] = set()
    for m in _URI_RE.findall(body):
        uri = _unescape(m)
        if uri not in seen:
            seen.add(uri)
            out.links.append(uri)
    for m in _TEXT_URL_RE.findall(out.text):
        url = m.rstrip(".,;")
        if url not in seen:
            seen.add(url)
            out.links.append(url)
    return out


_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+0\s+R")
_INFO_KV_RE = re.compile(rb"/(\w+)\s*\(((?:[^()\\]|\\.)*)\)")


def extract_pdf_meta(body: bytes) -> dict[str, str]:
    """Raw /Info dictionary literal-string entries (Title, CreationDate,
    ModDate, ...).  The reference reads reader.metadata and exif-parses each
    value (parse.py:128-151 get_pdf_meta); exif parsing happens in
    kernels.dates.clean_pdf_metadata so this stays a pure byte scanner."""
    m = _INFO_REF_RE.search(body)
    if not m:
        return {}
    obj_re = re.compile(rb"(?<![0-9])" + m.group(1) + rb"\s+0\s+obj\s*<<(.*?)>>", re.DOTALL)
    obj = obj_re.search(body)
    if not obj:
        return {}
    return {k.decode("latin-1"): _unescape(v) for k, v in _INFO_KV_RE.findall(obj.group(1))}


def convert_pdf(body: bytes, url: str) -> dict:
    """Single-node PDF -> document-field conversion (the kernel under the
    extract_pdf_doc UDF), mirroring reference transform.py:120-195 convert_pdf:

      title   = meta Title or filename stem (get_title_from_filename)
      content = title_separated + filename + text + links, sanitized
      description = title_separated + filename + summary(content)
      created_at = CreationDate; changed = ModDate or SourceModified;
      updated = CreationDate (all exif-parsed then ISO-formatted; the
      reference's wall-clock created_at fallback is omitted per the X18
      nondeterminism rule)
    """
    from . import urlnorm
    from .dates import clean_pdf_metadata, parse_dates_safely
    from .textproc import sanitize_text, summarize_text

    doc = extract_pdf_text(body)
    meta = clean_pdf_metadata(extract_pdf_meta(body))
    stem, _suffix, filename = urlnorm.url_base_extension(url or "")
    title = meta.get("Title") or (urlnorm.get_title_from_filename(filename) if filename else "")
    title_separated = meta.get("Title") or (urlnorm.separate_filename(filename) if filename else "")
    main_content = doc.text or title_separated
    summary, _kw = summarize_text(main_content, "en")
    content = " ".join(
        x for x in (title_separated, filename, f"{sanitize_text(main_content)} {' '.join(doc.links)}".strip()) if x
    )
    description = " ".join(x for x in (title_separated, filename, sanitize_text(summary)) if x)
    return {
        "title": title,
        "description": description,
        "content": content,
        "links": doc.links,
        "created_at": parse_dates_safely(meta.get("CreationDate")),
        "changed": parse_dates_safely(meta.get("ModDate"), meta.get("SourceModified")),
        "updated": parse_dates_safely(meta.get("CreationDate")),
    }


def make_simple_pdf(
    text_lines: list[str],
    annot_uris: list[str] | None = None,
    compress: bool = True,
    info: dict[str, str] | None = None,
) -> bytes:
    """Deterministic single-page PDF builder for fixtures (valid enough for
    this parser and for visual inspection; classic xref layout)."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = "BT /F1 12 Tf 72 720 Td " + " T* ".join(f"({esc(ln)}) Tj" for ln in text_lines) + " ET"
    stream = content.encode("latin-1")
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b"/Filter /FlateDecode "

    annots = b""
    annot_objs: list[bytes] = []
    if annot_uris:
        refs = " ".join(f"{5 + i} 0 R" for i in range(len(annot_uris)))
        annots = f"/Annots [{refs}] ".encode()
        for i, uri in enumerate(annot_uris):
            annot_objs.append(
                f"{5 + i} 0 obj\n<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] "
                f"/A << /S /URI /URI ({esc(uri)}) >> >>\nendobj\n".encode("latin-1")
            )

    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        + annots
        + b"/Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< " + filt + f"/Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream\nendobj\n",
        *annot_objs,
    ]
    info_ref = b""
    if info:
        info_n = 5 + len(annot_objs)
        kv = " ".join(f"/{k} ({esc(str(v))})" for k, v in sorted(info.items()))
        objs.append(f"{info_n} 0 obj\n<< {kv} >>\nendobj\n".encode("latin-1"))
        info_ref = f" /Info {info_n} 0 R".encode()
    header = b"%PDF-1.4\n"
    body = b"".join(objs)
    xref_pos = len(header) + len(body)
    trailer = (
        f"xref\n0 {len(objs) + 1}\n".encode()
        + b"0000000000 65535 f \n" * (len(objs) + 1)
        + f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{info_ref.decode()} >>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return header + body + trailer
