"""Minimal PDF text/link extraction kernel (SURVEY.md §2.9 X4, §2.6 U4).

The reference extracts PDF text with pypdf per page joined with " ", pulls
links from visible text regex plus /Annots URI actions, and prepends
title+filename (indexing/parse.py:113-252, transform.py:120-195).  pypdf is
unavailable in this environment; this module implements the same *shape* for
the well-formed subset our fixtures generate: classic (non-object-stream)
PDFs whose page content streams are plain or filtered with FlateDecode,
LZWDecode, ASCIIHexDecode or ASCII85Decode (including filter CHAINS, e.g.
[/ASCII85Decode /FlateDecode]) and whose text uses the standard Tj / TJ / '
operators with literal strings.  TJ kerning arrays are honored: pieces
within one TJ are concatenated, with a space inserted for kern offsets at
or below ``KERN_SPACE_THRESHOLD`` (pypdf's plain extraction inserts spaces
for large negative offsets the same way).

Since round 4/5 the subset also covers: /DecodeParms PNG (10-15, all five
row filters, numpy-vectorized Up/Sub) and TIFF-2 predictors, PDF 1.5 xref
STREAMS and /ObjStm object streams, composite-font hex show-strings through
per-font /ToUnicode CMaps, simple-font /Encoding /Differences tables
(AGL-subset glyph names, WinAnsi base via cp1252) selected per /Tf font,
and ENCRYPTED documents via the standard security handler (kernels/
pdfcrypt: RC4-40/128, AES-128 /V 4 and AES-256 /V 5 /R 6; the empty
user password — the owner-encrypted real-corpus shape — decrypts
transparently, and non-empty user/owner passwords are honored when the
caller supplies candidates; every entry point runs the decrypt pre-pass).
Remaining out of subset: embedded image codecs (irrelevant to text) and
SASLprep password normalization.  A production deployment can still swap
`extract_pdf_text` for a pypdf call with identical outputs.
"""

from __future__ import annotations

import base64
import re
import zlib
from dataclasses import dataclass, field

import numpy as np

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# one-pass show-text scan preserving operator ORDER: group 1 = Tj / '
# literal, group 2 = TJ array body (strings + kern numbers), group 3 =
# hex show string (composite-font codes, decoded via ToUnicode CMaps),
# group 4 = Tf font selection (drives per-font decode state)
_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')"
    rb"|\[((?:\((?:[^()\\]|\\.)*\)|[^\[\]()])*)\]\s*TJ"
    rb"|<([0-9A-Fa-f\s]+)>\s*(?:Tj|')"
    rb"|/(\w+)\s+[\d.]+\s+Tf"
)
_ARRAY_TOK_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(-?\d+(?:\.\d+)?)"
)
_URI_RE = re.compile(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)")
_TEXT_URL_RE = re.compile(r"https?://[^\s<>\")\]]+")
_FILTER_RE = re.compile(rb"/Filter\s*(\[(?:[^\]]*)\]|/\w+)")
_FILTER_NAME_RE = re.compile(rb"/(\w+)")

# a TJ kern offset at or below this (thousandths of an em) reads as a word
# gap; smaller offsets are intra-word kerning and concatenate directly
KERN_SPACE_THRESHOLD = -180.0

_ESCAPES = {b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}


def _unescape_bytes(raw: bytes) -> bytes:
    for esc, repl in _ESCAPES.items():
        raw = raw.replace(esc, repl)
    return re.sub(rb"\\([0-7]{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), raw)


def _unescape(raw: bytes) -> str:
    return _unescape_bytes(raw).decode("latin-1")


# -- stream filters (PDF 32000-1:2008 §7.4) -----------------------------------
def lzw_decode(data: bytes) -> bytes:
    """LZWDecode: big-endian variable-width codes, 9→12 bits, clear=256,
    EOD=257, EarlyChange=1 (the PDF default — code width grows one code
    early).  DecodeParms predictors are out of subset."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    out = bytearray()
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]  # KwKwK case
                else:
                    raise ValueError(f"bad LZW code {code}")
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code >= (1 << width) - 1 and width < 12:  # early change
                    width += 1
            out += entry
            prev = entry
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """LZW encoder (EarlyChange=1) for fixture building — the exact inverse
    of :func:`lzw_decode` (round-trip pytest-gated)."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # leading clear, as pdf encoders emit
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        if next_code < (1 << 12) - 2:  # fixture streams never fill the table
            table[w + c] = next_code
            next_code += 1
            # the decoder's table lags one entry behind, so its early-change
            # threshold (2^w - 1) pairs with 2^w here — see test_lzw_roundtrip
            if next_code >= (1 << width) and width < 12:
                width += 1
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def ascii_hex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: hex pairs, whitespace ignored, '>' terminates; an odd
    final digit is padded with 0."""
    body = data.split(b">")[0]
    digits = re.sub(rb"\s+", b"", body)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode: Adobe ascii85 with 'z' groups; optional leading <~ and
    trailing ~> delimiters; whitespace ignored."""
    body = re.sub(rb"\s+", b"", data)
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end != -1:
        body = body[:end]
    return base64.a85decode(body, adobe=False)


_FILTER_FUNCS = {
    b"FlateDecode": zlib.decompress,
    b"Fl": zlib.decompress,
    b"LZWDecode": lzw_decode,
    b"LZW": lzw_decode,
    b"ASCIIHexDecode": ascii_hex_decode,
    b"AHx": ascii_hex_decode,
    b"ASCII85Decode": ascii85_decode,
    b"A85": ascii85_decode,
}


def stream_filters(dict_part: bytes) -> list[bytes]:
    """Ordered /Filter names from a stream dictionary (name or array form)."""
    m = _FILTER_RE.search(dict_part)
    if not m:
        return []
    return _FILTER_NAME_RE.findall(m.group(1))


# -- DecodeParms predictors (PDF 32000-1:2008 §7.4.4.4, Tables 8-10) ----------

_PARM_NUM_RE = {
    key: re.compile(rb"/" + key + rb"\s+(\d+)")
    for key in (b"Predictor", b"Colors", b"BitsPerComponent", b"Columns")
}


def _parm(parms: bytes, key: bytes, default: int) -> int:
    m = _PARM_NUM_RE[key].search(parms)
    return int(m.group(1)) if m else default


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def apply_png_predictor(data: bytes, colors: int = 1, bpc: int = 8, columns: int = 1) -> bytes:
    """Reverse PNG row filters (predictors 10-15): each row is a filter-type
    byte (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth, PNG spec §6) followed
    by ``rowlen`` filtered bytes; reconstruction is byte-wise with ``bpp``
    look-back (the standard pypdf/zlib-tools semantics).

    Up and Sub — the layouts real writers emit almost exclusively
    (Predictor 12 Flate is the default for xref and content streams) — are
    numpy-vectorized: Up is element-wise uint8 addition against the prior
    row, Sub a per-channel-offset prefix sum along the row (uint8 cumsum
    wraps mod 256 by construction).  Average/Paeth keep the scalar
    reference loop (rare, and sequentially dependent in two dimensions)."""
    rowlen = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc + 7) // 8)
    stride = 1 + rowlen
    buf = np.frombuffer(data, dtype=np.uint8)
    nrows = (len(buf) + stride - 1) // stride
    if len(buf) < nrows * stride:  # tolerate short tail
        buf = np.concatenate([buf, np.zeros(nrows * stride - len(buf), dtype=np.uint8)])
    grid = buf.reshape(nrows, stride)
    ftypes = grid[:, 0]
    if ftypes.size and ftypes.max() > 4:
        raise ValueError(f"bad PNG filter type {int(ftypes.max())}")
    rows = grid[:, 1:].copy()
    prev = np.zeros(rowlen, dtype=np.uint8)
    for r in range(nrows):
        ftype = int(ftypes[r])
        row = rows[r]
        if ftype == 1:  # Sub: prefix sum per bpp phase, wrapping uint8
            for ofs in range(bpp):
                np.cumsum(row[ofs::bpp], dtype=np.uint8, out=row[ofs::bpp])
        elif ftype == 2:  # Up: element-wise wrap-add against the prior row
            np.add(row, prev, out=row)
        elif ftype == 3:  # Average
            for i in range(rowlen):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(rowlen):
                left = int(row[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + _paeth(left, int(prev[i]), upleft)) & 0xFF
        prev = row
    return rows.tobytes()


def apply_tiff_predictor(data: bytes, colors: int = 1, bpc: int = 8, columns: int = 1) -> bytes:
    """Reverse TIFF Predictor 2 (horizontal differencing; 8-bit components
    only — the overwhelmingly common case)."""
    if bpc != 8:
        raise ValueError(f"TIFF predictor with BitsPerComponent={bpc} unsupported")
    rowlen = columns * colors
    out = bytearray(data)
    for start in range(0, len(out), rowlen):
        end = min(start + rowlen, len(out))
        for i in range(start + colors, end):
            out[i] = (out[i] + out[i - colors]) & 0xFF
    return bytes(out)


_PARMS_KEY_RE = re.compile(rb"/(?:DecodeParms|DP)\s*")


def stream_decode_parms(dict_part: bytes) -> list[bytes]:
    """Per-filter DecodeParms dict bodies (empty bytes = no parms), aligned
    with :func:`stream_filters` (name form -> one entry; array form -> one
    entry per element, ``null`` -> empty).

    Balanced-delimiter parsing (round-4 ADVICE): a parms dict containing a
    nested array or nested dict — legal in real PDFs — previously truncated
    the non-greedy regex and misaligned the per-filter list; now dicts
    match to their balanced ``>>`` and the array walk skips non-dict
    tokens, so nesting cannot shift predictor parms onto the wrong filter.
    Structurally hopeless input yields [] (no predictor applied)."""
    m = _PARMS_KEY_RE.search(dict_part)
    if not m:
        return []
    i = m.end()
    if dict_part.startswith(b"null", i):
        return [b""]
    if dict_part.startswith(b"<<", i):
        end = _match_delim(dict_part, i + 2, b"<<", b">>")
        return [dict_part[i + 2 : end]] if end >= 0 else []
    if dict_part.startswith(b"[", i):
        end = _match_delim(dict_part, i + 1, b"[", b"]")
        if end < 0:
            return []
        body = dict_part[i + 1 : end]
        out: list[bytes] = []
        j = 0
        while j < len(body):
            if body.startswith(b"null", j):
                out.append(b"")
                j += 4
            elif body.startswith(b"<<", j):
                e = _match_delim(body, j + 2, b"<<", b">>")
                if e < 0:
                    return []
                out.append(body[j + 2 : e])
                j = e + 2
            else:
                j += 1
        return out
    return []


def _apply_predictor(parms: bytes, data: bytes) -> bytes:
    pred = _parm(parms, b"Predictor", 1)
    if pred <= 1:
        return data
    colors = _parm(parms, b"Colors", 1)
    bpc = _parm(parms, b"BitsPerComponent", 8)
    columns = _parm(parms, b"Columns", 1)
    if pred == 2:
        return apply_tiff_predictor(data, colors, bpc, columns)
    if 10 <= pred <= 15:
        return apply_png_predictor(data, colors, bpc, columns)
    raise ValueError(f"unsupported predictor {pred}")


def decode_stream(dict_part: bytes, stream: bytes) -> bytes:
    """Apply the stream's filter chain in declaration order, honoring each
    filter's /DecodeParms predictor (PNG 10-15 and TIFF 2) for Flate/LZW.
    Raises on an unsupported filter or corrupt data (callers skip such
    streams)."""
    data = stream
    filters = stream_filters(dict_part)
    parms_list = stream_decode_parms(dict_part)
    if len(parms_list) > 1 and len(parms_list) != len(filters):
        # array-form parms that don't pair 1:1 with the filter chain:
        # skipping predictors beats applying one to the wrong filter index
        parms_list = []
    for idx, name in enumerate(filters):
        fn = _FILTER_FUNCS.get(name)
        if fn is None:
            raise ValueError(f"unsupported PDF filter {name!r}")
        data = fn(data)
        parms = parms_list[idx] if idx < len(parms_list) else b""
        if parms and name in (b"FlateDecode", b"Fl", b"LZWDecode", b"LZW"):
            data = _apply_predictor(parms, data)
    return data


@dataclass
class PdfDoc:
    text: str = ""
    links: list[str] = field(default_factory=list)
    n_streams: int = 0


# -- simple-font encodings (PDF §9.6.6: /Encoding dicts with /Differences) ---
#
# A subset font's /Differences array remaps byte codes to glyph NAMES; naive
# latin-1 decoding of its show-strings produces garbage (the most common
# remaining real-corpus text defect after round 4 — reference breadth via
# pypdf, indexing/parse.py:113-252).  Glyph names resolve through a compact
# Adobe-Glyph-List subset plus the uniXXXX/uXXXX conventions.

_GLYPH_NAMES: dict[str, str] = {
    # ASCII punctuation / digits (AGL names)
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#", "dollar": "$",
    "percent": "%", "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=", "greater": ">",
    "question": "?", "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    # common Latin-1 / WinAnsi names
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "section": "§",
    "copyright": "©", "ordfeminine": "ª", "guillemotleft": "«",
    "registered": "®", "degree": "°", "plusminus": "±",
    "paragraph": "¶", "periodcentered": "·", "ordmasculine": "º",
    "guillemotright": "»", "questiondown": "¿",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å", "AE": "Æ",
    "Ccedilla": "Ç", "Egrave": "È", "Eacute": "É",
    "Ecircumflex": "Ê", "Edieresis": "Ë", "Igrave": "Ì",
    "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Eth": "Ð", "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö",
    "multiply": "×", "Oslash": "Ø", "Ugrave": "Ù",
    "Uacute": "Ú", "Ucircumflex": "Û", "Udieresis": "Ü",
    "Yacute": "Ý", "Thorn": "Þ", "germandbls": "ß",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å", "ae": "æ",
    "ccedilla": "ç", "egrave": "è", "eacute": "é",
    "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "eth": "ð", "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "divide": "÷", "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ",
    # WinAnsi 0x80-0x9F specials
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ", "perthousand": "‰",
    "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
    "Zcaron": "Ž", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”", "bullet": "•",
    "endash": "–", "emdash": "—", "tilde": "˜",
    "trademark": "™", "scaron": "š", "guilsinglright": "›",
    "oe": "œ", "zcaron": "ž", "Ydieresis": "Ÿ",
    "dotlessi": "ı", "fi": "ﬁ", "fl": "ﬂ", "minus": "−",
    "fraction": "⁄", "nbspace": "\u00a0",
}
# single-character names (a, B, 7, ...) map to themselves per the AGL
_UNI_NAME_RE = re.compile(r"^uni([0-9A-Fa-f]{4,6})$|^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> str | None:
    """AGL-subset glyph-name resolution: table hit, single-char identity,
    or the uniXXXX / uXXXX hex conventions.  None for unknown names
    (subset-font gXX/cidXX indices carry no unicode semantics)."""
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if len(name) == 1:
        return name
    m = _UNI_NAME_RE.match(name)
    if m:
        try:
            return chr(int(m.group(1) or m.group(2), 16))
        except (ValueError, OverflowError):
            return None
    return None


@dataclass
class PdfFont:
    """Resolved per-font decode state (PDF §9.6-9.10).

    ``composite``: /Subtype /Type0 — show-strings are multi-byte codes
    through the associated ``cmap``.  Simple fonts decode byte-per-code via
    ``diff_map`` (from /Encoding /Differences) over ``base`` (cp1252 for
    /WinAnsiEncoding, latin-1 otherwise — StandardEncoding approximated)."""

    composite: bool = False
    cmap: tuple[int, dict[int, str]] | None = None
    diff_map: dict[int, str] = field(default_factory=dict)
    base: str = "latin-1"


def _match_delim(data: bytes, start: int, open_tok: bytes, close_tok: bytes) -> int:
    """End index (exclusive of close_tok) of the balanced region opening at
    ``start`` (which must point just past ``open_tok``); -1 if unbalanced."""
    depth = 1
    i = start
    while i < len(data):
        if data.startswith(open_tok, i):
            depth += 1
            i += len(open_tok)
        elif data.startswith(close_tok, i):
            depth -= 1
            if depth == 0:
                return i
            i += len(close_tok)
        else:
            i += 1
    return -1


_DIFF_TOK_RE = re.compile(rb"/([^\s/\[\]<>()]+)|(\d+)")
_ENC_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")
_ENC_NAME_RE = re.compile(rb"/Encoding\s*/(\w+)")
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_FONT_TYPE_RE = re.compile(rb"/Type\s*/Font\b")
_BASEENC_RE = re.compile(rb"/BaseEncoding\s*/(\w+)")
_FONT_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)


def _parse_differences(enc_dict: bytes) -> dict[int, str]:
    """/Differences [ code /name /name code /name ... ] -> {code: unicode}.
    Unknown glyph names are DROPPED (decode to ""), mirroring the CMap
    unmapped-glyph policy — a wrong character is worse than a missing one."""
    idx = enc_dict.find(b"/Differences")
    if idx < 0:
        return {}
    open_idx = enc_dict.find(b"[", idx)
    if open_idx < 0:
        return {}
    end = _match_delim(enc_dict, open_idx + 1, b"[", b"]")
    if end < 0:
        return {}
    out: dict[int, str] = {}
    code = 0
    for m in _DIFF_TOK_RE.finditer(enc_dict[open_idx + 1 : end]):
        if m.group(2) is not None:
            code = int(m.group(2))
        else:
            uni = glyph_to_unicode(m.group(1).decode("latin-1"))
            if 0 <= code <= 255:
                out[code] = uni if uni is not None else ""
            code += 1
    return out


def _extract_dict_after(data: bytes, key: bytes) -> bytes | None:
    """The balanced << ... >> dict following ``key`` in ``data``, or None."""
    idx = data.find(key)
    if idx < 0:
        return None
    open_idx = data.find(b"<<", idx)
    if open_idx < 0:
        return None
    end = _match_delim(data, open_idx + 2, b"<<", b">>")
    return data[open_idx + 2 : end] if end >= 0 else None


def build_font_table(
    objects: dict[int, bytes], cmap_by_obj: dict[int, tuple[int, dict[int, str]]]
) -> dict[bytes, PdfFont]:
    """Resource-name -> PdfFont over every /Font resource dict in the
    document (page dicts, raw or ObjStm-compressed).

    Per-font association (vs the document-global CMap heuristic): each
    /Tf-selected font decodes its show-strings through ITS OWN ToUnicode
    CMap or /Differences table, so a multi-font document can no longer have
    the wrong font's CMap win on a best-fraction guess.  Document-global
    merge of resource names (last wins) — per-page scoping is not modeled,
    and unresolvable names simply fall back to the global heuristic.
    """
    fonts: dict[bytes, PdfFont] = {}

    def parse_font_obj(obj: bytes) -> PdfFont | None:
        if not _FONT_TYPE_RE.search(obj):
            return None
        font = PdfFont(composite=bool(_TYPE0_RE.search(obj)))
        m = _TOUNICODE_REF_RE.search(obj)
        if m and int(m.group(1)) in cmap_by_obj:
            font.cmap = cmap_by_obj[int(m.group(1))]
        enc_dict = _extract_dict_after(obj, b"/Encoding")
        if enc_dict is None:
            m = _ENC_REF_RE.search(obj)
            if m and int(m.group(1)) in objects:
                enc_obj = objects[int(m.group(1))]
                enc_dict = _extract_dict_after(enc_obj, b"<<")
                if enc_dict is None:
                    enc_dict = enc_obj
        base_name = None
        if enc_dict is not None:
            font.diff_map = _parse_differences(enc_dict)
            mb = _BASEENC_RE.search(enc_dict)
            if mb:
                base_name = mb.group(1)
        else:
            mn = _ENC_NAME_RE.search(obj)
            if mn:
                base_name = mn.group(1)
        if base_name == b"WinAnsiEncoding":
            font.base = "cp1252"
        return font

    for src in objects.values():
        fidx = src.find(b"/Font")
        if fidx < 0:
            continue
        fdict = _extract_dict_after(src, b"/Font")
        if fdict is None:
            continue
        for m in _FONT_ENTRY_RE.finditer(fdict):
            ref = int(m.group(2))
            if ref in objects:
                font = parse_font_obj(objects[ref])
                if font is not None:
                    fonts[m.group(1)] = font
    return fonts


def _decode_simple_bytes(raw: bytes, font: PdfFont) -> str:
    """Byte-per-code simple-font decode: /Differences remap first, then the
    base encoding (cp1252 for WinAnsi — exact for 0x80-0x9F smart quotes
    etc. — latin-1 otherwise)."""
    out: list[str] = []
    for b in raw:
        if b in font.diff_map:
            out.append(font.diff_map[b])
        elif font.base == "latin-1":
            out.append(chr(b))
        else:
            out.append(bytes([b]).decode(font.base, errors="replace"))
    return "".join(out)


# -- ToUnicode CMaps (composite fonts; PDF §9.10.3, Adobe CMap spec) ----------

_CMAP_HINT = b"begincmap"
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.DOTALL)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|\[((?:<[0-9A-Fa-f]+>|\s)+)\]")


def _utf16be(hexs: bytes) -> str:
    if len(hexs) % 2:
        hexs += b"0"  # tolerate odd-length destinations from sloppy writers
    raw = bytes.fromhex(hexs.decode("ascii"))
    return raw.decode("utf-16-be", errors="replace")


def _has_cmap_structure(data: bytes) -> bool:
    """CMap classification: requires structural section tokens, not just the
    `begincmap` keyword — a content stream whose visible TEXT mentions
    'begincmap' (a PDF about PDFs) must not be misclassified; it is kept as
    content when it carries show-text operators (checked at the call site)."""
    return _CMAP_HINT in data and (
        b"begincodespacerange" in data or b"beginbfchar" in data or b"beginbfrange" in data
    )


def _parse_cmap_bytes(data: bytes) -> tuple[int, dict[int, str]] | None:
    """Parse one decoded ToUnicode CMap; malformed entries are skipped
    best-effort and a structurally hopeless stream yields None — one bad
    crawled PDF must degrade, never crash the extraction task."""
    width = 2
    m = _CODESPACE_RE.search(data)
    if m:
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if toks:
            width = max(1, len(toks[0]) // 2)
    mapping: dict[int, str] = {}
    for sect in _BFCHAR_RE.findall(data):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", sect)
        for src, dst in zip(toks[0::2], toks[1::2]):
            try:
                mapping[int(src, 16)] = _utf16be(dst)
            except ValueError:
                continue  # malformed pair: skip, keep the rest
    for sect in _BFRANGE_RE.findall(data):
        toks = list(_HEX_TOK_RE.finditer(sect))
        i = 0
        while i + 3 <= len(toks):
            lo_t, hi_t, dst_t = toks[i], toks[i + 1], toks[i + 2]
            i += 3
            if lo_t.group(1) is None or hi_t.group(1) is None:
                break  # malformed triple
            try:
                lo, hi = int(lo_t.group(1), 16), int(hi_t.group(1), 16)
                if hi < lo or hi - lo > 0x10000:
                    continue  # nonsense range: skip
                if dst_t.group(1) is not None:  # consecutive destinations
                    base_hex = dst_t.group(1)
                    if len(base_hex) % 2:
                        base_hex += b"0"
                    base = int(base_hex, 16)
                    nbytes = len(base_hex) // 2
                    for off in range(hi - lo + 1):
                        v = base + off
                        # widen rather than overflow when the range walks
                        # past the destination byte width (sloppy writers)
                        vb = v.to_bytes(max(nbytes, (v.bit_length() + 7) // 8), "big")
                        mapping[lo + off] = vb.decode("utf-16-be", errors="replace")
                else:  # explicit destination array, one entry per code
                    dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst_t.group(2))
                    for off, d in enumerate(dsts[: hi - lo + 1]):
                        mapping[lo + off] = _utf16be(d)
            except ValueError:
                continue
    return (width, mapping) if mapping else None


def parse_tounicode_cmaps(body: bytes) -> list[tuple[int, dict[int, str]]]:
    """(code_width_bytes, {code -> unicode}) per ToUnicode CMap stream in
    the document: codespacerange fixes the code width, bfchar maps single
    codes, bfrange maps [lo..hi] -> consecutive destinations (or an explicit
    destination array).  Destinations are UTF-16BE per the spec."""
    out: list[tuple[int, dict[int, str]]] = []
    for dict_part, stream in _STREAM_RE.findall(body):
        try:
            data = decode_stream(dict_part, stream)
        except (ValueError, zlib.error):
            continue
        if not _has_cmap_structure(data):
            continue
        parsed = _parse_cmap_bytes(data)
        if parsed is not None:
            out.append(parsed)
    return out


def _decode_hex_show(hextok: bytes, cmaps: list[tuple[int, dict[int, str]]]) -> str:
    """Decode one hex show-string: try each CMap (splitting the byte string
    into its code width), pick the one mapping every code; fall back to
    latin-1 single bytes (simple-font hex strings with no ToUnicode)."""
    digits = re.sub(rb"\s+", b"", hextok)
    if len(digits) % 2:
        digits += b"0"  # PDF: odd final digit reads as 0
    raw = bytes.fromhex(digits.decode("ascii"))
    best: str | None = None
    best_frac: float | None = None
    for width, mapping in cmaps:
        if len(raw) % width:
            continue
        codes = [int.from_bytes(raw[i : i + width], "big") for i in range(0, len(raw), width)]
        missing = sum(1 for c in codes if c not in mapping)
        if missing == 0:
            return "".join(mapping[c] for c in codes)
        frac = missing / max(1, len(codes))
        if best_frac is None or frac < best_frac:
            best_frac = frac
            best = "".join(mapping.get(c, "") for c in codes)
    if best is not None and best_frac is not None and best_frac < 0.5:
        return best  # majority of codes mapped: trust the CMap, drop the rest
    return raw.decode("latin-1")


_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")


def _expand_objstm_bytes(dict_part: bytes, data: bytes) -> list[tuple[int, int, bytes]]:
    """Split one DECODED /ObjStm payload into (objnum, index, object_bytes)
    via the N ``objnum offset`` header pairs + /First."""
    m_first, m_n = _OBJSTM_FIRST_RE.search(dict_part), _OBJSTM_N_RE.search(dict_part)
    if not m_first or not m_n:
        return []
    first, n = int(m_first.group(1)), int(m_n.group(1))
    header = data[:first].split()
    if len(header) < 2 * n:
        return []
    try:
        pairs = [(int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)]
    except ValueError:
        return []
    out = []
    for i, (objnum, off) in enumerate(pairs):
        end = first + pairs[i + 1][1] if i + 1 < n else len(data)
        out.append((objnum, i, data[first + off : end]))
    return out


def expand_object_streams(body: bytes) -> list[tuple[int, int, bytes]]:
    """Decode every /Type /ObjStm stream (PDF 1.5 compressed-object
    container, §7.5.7) and split out its embedded objects.

    Returns (objnum, index, object_bytes) for every object in every object
    stream: the stream's decoded form is N whitespace-separated
    ``objnum offset`` integer pairs followed by the serialized objects
    starting at /First.  Undecodable or malformed streams are skipped
    (consistent with the tolerant scanner elsewhere)."""
    out: list[tuple[int, int, bytes]] = []
    for dict_part, stream in _STREAM_RE.findall(body):
        if not _OBJSTM_TYPE_RE.search(dict_part):
            continue
        try:
            data = decode_stream(dict_part, stream)
        except (ValueError, zlib.error):
            continue
        out.extend(_expand_objstm_bytes(dict_part, data))
    return out


def extract_pdf_text(body: bytes) -> PdfDoc:
    """Text + links from a simple PDF (see module doc for subset limits).

    Text fragments per content stream are joined with spaces, streams joined
    with " " (the reference joins pages with " ", parse.py:113-151).  Links =
    /Annots URI actions ∪ URLs matched in visible text, first-seen order,
    deduplicated (parse.py:214-252 get_pdf_links).

    SINGLE decompression pass: every stream decodes exactly once, then is
    classified — ObjStm containers expand, XRef streams drop, ToUnicode
    CMaps (structural tokens AND no show-text operators, so a page whose
    visible text merely mentions 'begincmap' stays content) parse, and the
    rest scan for show-text.  Any per-stream failure degrades that stream,
    never the document (one bad crawled PDF must not fail a Spark task).
    """
    out = PdfDoc()
    if not body.startswith(b"%PDF"):
        return out
    if b"/Encrypt" in body:  # standard-security-handler pre-pass (§7.6)
        from . import pdfcrypt

        body = pdfcrypt.decrypt_pdf(body)
    cmaps: list[tuple[int, dict[int, str]]] = []
    cmap_by_obj: dict[int, tuple[int, dict[int, str]]] = {}
    objstm_objs: list[tuple[int, int, bytes]] = []
    content: list[bytes] = []
    _OBJ_PREFIX_RE = re.compile(rb"(\d+)\s+\d+\s+obj\s*$")
    for sm in _STREAM_RE.finditer(body):
        dict_part, stream = sm.group(1), sm.group(2)
        out.n_streams += 1
        try:
            data = decode_stream(dict_part, stream)
        except (ValueError, zlib.error):
            continue
        if _OBJSTM_TYPE_RE.search(dict_part):
            objstm_objs.extend(_expand_objstm_bytes(dict_part, data))
            continue
        if b"/XRef" in dict_part:
            continue  # cross-reference stream: binary rows, no text
        if _has_cmap_structure(data) and not _SHOW_RE.search(data):
            parsed = _parse_cmap_bytes(data)
            if parsed is not None:
                cmaps.append(parsed)
                # object number (for per-font /ToUnicode association): the
                # `N G obj` token immediately preceding this stream's dict
                pm = _OBJ_PREFIX_RE.search(body, max(0, sm.start() - 48), sm.start())
                if pm:
                    cmap_by_obj[int(pm.group(1))] = parsed
            continue
        content.append(data)

    # per-font decode state (PDF §9.6-9.10): resource name -> PdfFont, from
    # every indirect object (raw body + ObjStm-expanded).  Any structural
    # surprise degrades to the document-global fallback, never fails the doc.
    try:
        objects: dict[int, bytes] = {
            int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(body)
        }
        for objnum, _idx, obj in objstm_objs:
            objects[objnum] = obj
        fonts = build_font_table(objects, cmap_by_obj)
    except Exception:  # noqa: BLE001 - tolerant scanner contract
        fonts = {}

    def decode_literal(raw: bytes, font: PdfFont | None) -> str:
        if font is not None and not font.composite:
            return _decode_simple_bytes(_unescape_bytes(raw), font)
        return _unescape(raw)

    def decode_hex(hextok: bytes, font: PdfFont | None) -> str:
        if font is not None:
            if font.composite and font.cmap is not None:
                width, mapping = font.cmap
                digits = re.sub(rb"\s+", b"", hextok)
                if len(digits) % 2:
                    digits += b"0"
                raw = bytes.fromhex(digits.decode("ascii"))
                if len(raw) % width == 0:
                    codes = [
                        int.from_bytes(raw[i : i + width], "big")
                        for i in range(0, len(raw), width)
                    ]
                    # THIS font's CMap is authoritative; unmapped codes drop
                    # (subset-font notdefs), never another font's guess
                    return "".join(mapping.get(c, "") for c in codes)
            elif not font.composite and (font.diff_map or font.base != "latin-1"):
                digits = re.sub(rb"\s+", b"", hextok)
                if len(digits) % 2:
                    digits += b"0"
                return _decode_simple_bytes(bytes.fromhex(digits.decode("ascii")), font)
        return _decode_hex_show(hextok, cmaps)

    parts: list[str] = []
    for data in content:
        frags: list[str] = []
        font: PdfFont | None = None  # text state resets per content stream
        for m in _SHOW_RE.finditer(data):
            if m.group(4) is not None:  # Tf: select the current font
                font = fonts.get(m.group(4))
            elif m.group(1) is not None:  # Tj / ' literal string
                frags.append(decode_literal(m.group(1), font))
            elif m.group(3) is not None:  # Tj / ' hex string (composite font)
                frags.append(decode_hex(m.group(3), font))
            else:  # TJ kerning array: concat pieces, big kern gap -> space
                pieces: list[str] = []
                for t in _ARRAY_TOK_RE.finditer(m.group(2)):
                    if t.group(1) is not None:
                        pieces.append(decode_literal(t.group(1), font))
                    elif t.group(2) is not None:
                        pieces.append(decode_hex(t.group(2), font))
                    elif float(t.group(3)) <= KERN_SPACE_THRESHOLD:
                        pieces.append(" ")
                frags.append("".join(pieces))
        if frags:
            parts.append(" ".join(f for f in frags if f))
    out.text = " ".join(p for p in parts if p).strip()

    seen: set[str] = set()
    # /Annots URI actions: raw objects first, then objects compressed into
    # object streams (both annot-first relative to visible-text URLs,
    # matching the reference's get_pdf_links union order)
    for src in [body] + [obj for _n, _i, obj in objstm_objs]:
        for m in _URI_RE.findall(src):
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
    if b"/Encrypt" in body:  # standard-security-handler pre-pass (§7.6)
        from . import pdfcrypt

        body = pdfcrypt.decrypt_pdf(body)
    m = _INFO_REF_RE.search(body)
    if not m:
        return {}
    obj_re = re.compile(rb"(?<![0-9])" + m.group(1) + rb"\s+0\s+obj\s*<<(.*?)>>", re.DOTALL)
    obj = obj_re.search(body)
    if obj:
        return {k.decode("latin-1"): _unescape(v) for k, v in _INFO_KV_RE.findall(obj.group(1))}
    # /Info object compressed into an object stream (PDF 1.5 §7.5.7)
    info_num = int(m.group(1))
    for objnum, _idx, data in expand_object_streams(body):
        if objnum == info_num:
            dm = re.search(rb"<<(.*?)>>", data, re.DOTALL)
            if dm:
                return {k.decode("latin-1"): _unescape(v) for k, v in _INFO_KV_RE.findall(dm.group(1))}
    return {}


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


_FIXTURE_ENCODERS = {
    "FlateDecode": zlib.compress,
    "LZWDecode": lzw_encode,
    "ASCIIHexDecode": lambda b: b.hex().encode("ascii") + b">",
    "ASCII85Decode": lambda b: base64.a85encode(b) + b"~>",
}


def png_predictor_encode(
    data: bytes, filter_type: int | list[int], colors: int = 1, bpc: int = 8, columns: int = 1
) -> bytes:
    """Forward PNG row filtering for fixture building — the exact inverse of
    :func:`apply_png_predictor` (round-trip pytest-gated).  ``filter_type``
    0-4 is applied to every row; a list cycles per row (the Predictor-15
    "optimum" shape, where each row picks its own filter)."""
    rowlen = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc + 7) // 8)
    types = filter_type if isinstance(filter_type, list) else [filter_type]
    padded = bytearray(data)
    if len(padded) % rowlen:
        padded.extend(b"\x00" * (rowlen - len(padded) % rowlen))
    out = bytearray()
    prev = bytearray(rowlen)
    for rowno, start in enumerate(range(0, len(padded), rowlen)):
        filter_type = types[rowno % len(types)]
        raw = padded[start : start + rowlen]
        row = bytearray(raw)
        if filter_type == 1:  # Sub
            for i in range(rowlen - 1, bpp - 1, -1):
                row[i] = (row[i] - raw[i - bpp]) & 0xFF
        elif filter_type == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] - prev[i]) & 0xFF
        elif filter_type == 3:  # Average
            for i in range(rowlen - 1, -1, -1):
                left = raw[i - bpp] if i >= bpp else 0
                row[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            for i in range(rowlen - 1, -1, -1):
                left = raw[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] - _paeth(left, prev[i], upleft)) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"bad PNG filter type {filter_type}")
        out.append(filter_type)
        out.extend(row)
        prev = raw
    return bytes(out)


def make_simple_pdf(
    text_lines: list[str],
    annot_uris: list[str] | None = None,
    compress: bool = True,
    info: dict[str, str] | None = None,
    filters: list[str] | None = None,
    tj_arrays: list[list[str | float]] | None = None,
    predictor: int | None = None,
    predictor_columns: int = 16,
    xref_stream: bool = False,
    obj_stream: bool = False,
    hex_text_lines: list[str] | None = None,
    diff_text_lines: list[str] | None = None,
) -> bytes:
    """Deterministic single-page PDF builder for fixtures (valid enough for
    this parser and for visual inspection; classic xref layout, or a PDF 1.5
    cross-reference STREAM when ``xref_stream=True``).

    ``filters``: ordered decode-side filter chain (e.g.
    ``["ASCII85Decode", "FlateDecode"]``); overrides ``compress``.
    ``tj_arrays``: extra show-text TJ kerning arrays, each a list of string
    pieces and numeric kern offsets (e.g. ``[["Hel", -30, "lo"]]``).
    ``predictor``: PNG predictor (10-15) applied to the content stream before
    its first Flate/LZW encode, declared via /DecodeParms (the row filter
    used is predictor-10+``ftype`` so 12 = all-Up rows, matching how real
    writers use a single filter type; pypdf decodes per-row regardless).
    ``xref_stream``: emit the PDF 1.5 layout — the cross-reference table is
    itself a /Type /XRef stream (W [1 2 2] binary rows), Flate-compressed
    with /Predictor 12, and the trailer dict lives in the stream dict.
    ``obj_stream``: additionally compress the annot + /Info objects into a
    /Type /ObjStm container (type-2 xref entries) — the PDF 1.5 compressed-
    object layout real writers pair with xref streams.
    ``hex_text_lines``: lines shown as two-byte HEX strings through a
    generated /ToUnicode CMap whose codes are offset into the private-use
    area (0xE000 + ord) — decoding them correctly REQUIRES the CMap
    (consecutive-ordinal runs become bfrange entries, the rest bfchar), so
    a byte-fallback reader produces garbage, not silently-correct text.
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = [f"({esc(ln)}) Tj" for ln in text_lines]
    for arr in tj_arrays or []:
        toks = " ".join(f"({esc(t)})" if isinstance(t, str) else f"{t:g}" for t in arr)
        ops.append(f"[{toks}] TJ")
    cmap_obj_body: bytes | None = None
    if hex_text_lines:
        code = lambda c: 0xE000 + ord(c)  # noqa: E731 - private-use offset
        for ln in hex_text_lines:
            ops.append("<" + "".join(f"{code(c):04X}" for c in ln) + "> Tj")
        chars = sorted({c for ln in hex_text_lines for c in ln})
        # consecutive-ordinal runs of >= 3 go to bfrange, the rest to bfchar
        runs: list[list[str]] = []
        for c in chars:
            if runs and ord(c) == ord(runs[-1][-1]) + 1:
                runs[-1].append(c)
            else:
                runs.append([c])
        bfchar = [c for r in runs if len(r) < 3 for c in r]
        bfrange = [r for r in runs if len(r) >= 3]
        sections = ["1 begincodespacerange <0000> <FFFF> endcodespacerange"]
        if bfchar:
            entries = " ".join(f"<{code(c):04X}> <{ord(c):04X}>" for c in bfchar)
            sections.append(f"{len(bfchar)} beginbfchar {entries} endbfchar")
        if bfrange:
            entries = " ".join(
                f"<{code(r[0]):04X}> <{code(r[-1]):04X}> <{ord(r[0]):04X}>" for r in bfrange
            )
            sections.append(f"{len(bfrange)} beginbfrange {entries} endbfrange")
        cmap_text = (
            "/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
            + " ".join(sections)
            + " endcmap CMapName currentdict /CMap defineresource pop end end"
        )
        cmap_obj_body = zlib.compress(cmap_text.encode("latin-1"))
    resources = b""
    diff_chars: list[str] = []
    if diff_text_lines:
        # subset-font style /Differences remap: distinct chars get sequential
        # codes from 0x21, DELIBERATELY misaligned with ASCII so a naive
        # latin-1 reader produces garbage — decoding requires the /Encoding
        # /Differences table through the /F2 font object.
        diff_chars = sorted({c for ln in diff_text_lines for c in ln})
        if len(diff_chars) > 200:
            raise ValueError("diff fixture supports at most 200 distinct chars")
        codemap = {c: 0x21 + i for i, c in enumerate(diff_chars)}
        ops.append("/F2 12 Tf")
        for ln in diff_text_lines:
            ops.append("(" + "".join(f"\\{codemap[c]:03o}" for c in ln) + ") Tj")
        # object numbering: annots, info, cmap, then the two font objects
        _f1 = 5 + len(annot_uris or []) + (1 if info else 0) + (1 if cmap_obj_body is not None else 0)
        resources = f"/Resources << /Font << /F1 {_f1} 0 R /F2 {_f1 + 1} 0 R >> >> ".encode()
    content = "BT /F1 12 Tf 72 720 Td " + " T* ".join(ops) + " ET"
    stream = content.encode("latin-1")
    if filters is None:
        filters = ["FlateDecode"] if compress else []
    parms = b""
    if predictor is not None:
        # the predictor pairs with the filter whose DECODE runs last (i.e.
        # the first one applied at encode time), so it must be the chain's
        # final /Filter entry — e.g. [/ASCII85Decode /FlateDecode]
        if not filters or filters[-1] not in ("FlateDecode", "LZWDecode"):
            raise ValueError("predictor requires a Flate/LZW final filter")
        # 10-14 -> fixed row filter None/Sub/Up/Average/Paeth; 15 ("optimum",
        # per-row choice) -> cycle all five so the decoder's per-row dispatch
        # is exercised
        ftype: int | list[int] = [0, 1, 2, 3, 4] if predictor == 15 else predictor - 10
        stream = png_predictor_encode(stream, ftype, columns=predictor_columns)
        parms_dict = f"<< /Predictor {predictor} /Columns {predictor_columns} >>"
        if len(filters) == 1:
            parms = f"/DecodeParms {parms_dict} ".encode()
        else:
            nulls = " ".join(["null"] * (len(filters) - 1))
            # /DecodeParms arrays pair with /Filter positionally
            parms = f"/DecodeParms [{nulls} {parms_dict}] ".encode()
    # decode order is filters[0], filters[1], ... -> encode in REVERSE
    for name in reversed(filters):
        stream = _FIXTURE_ENCODERS[name](stream)
    if not filters:
        filt = b""
    elif len(filters) == 1:
        filt = f"/Filter /{filters[0]} ".encode() + parms
    else:
        filt = ("/Filter [" + " ".join(f"/{n}" for n in filters) + "] ").encode() + parms

    n_annots = len(annot_uris or [])
    annots = b""
    if annot_uris:
        refs = " ".join(f"{5 + i} 0 R" for i in range(n_annots))
        annots = f"/Annots [{refs}] ".encode()
    annot_dicts = [
        f"<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] "
        f"/A << /S /URI /URI ({esc(uri)}) >> >>".encode("latin-1")
        for uri in (annot_uris or [])
    ]
    info_n = 5 + n_annots
    info_dict = b""
    if info:
        kv = " ".join(f"/{k} ({esc(str(v))})" for k, v in sorted(info.items()))
        info_dict = f"<< {kv} >>".encode("latin-1")

    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        + annots
        + resources
        + b"/Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< " + filt + f"/Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream\nendobj\n",
    ]
    # compressed objects: annots + /Info serialized INTO a /Type /ObjStm
    # container (PDF 1.5 §7.5.7) instead of standing as classic objects
    inner: list[tuple[int, bytes]] = []
    if obj_stream:
        if not xref_stream:
            raise ValueError("obj_stream requires the xref_stream layout (type-2 entries)")
        inner = [(5 + i, d) for i, d in enumerate(annot_dicts)]
        if info:
            inner.append((info_n, info_dict))
    else:
        for i, d in enumerate(annot_dicts):
            objs.append(f"{5 + i} 0 obj\n".encode() + d + b"\nendobj\n")
        if info:
            objs.append(f"{info_n} 0 obj\n".encode() + info_dict + b"\nendobj\n")
    next_num = info_n + (1 if info else 0)
    if cmap_obj_body is not None:
        objs.append(
            f"{next_num} 0 obj\n<< /Filter /FlateDecode /Length {len(cmap_obj_body)} "
            f">>\nstream\n".encode()
            + cmap_obj_body
            + b"\nendstream\nendobj\n"
        )
        next_num += 1
    if diff_text_lines:
        def glyph_name(c: str) -> str:
            for name, ch in _GLYPH_NAMES.items():
                if ch == c:
                    return name
            if c.isascii() and (c.isalpha() or c.isdigit()):
                return c  # single-char AGL identity
            return f"uni{ord(c):04X}"

        diffs = " ".join(["33"] + ["/" + glyph_name(c) for c in diff_chars])
        objs.append(
            f"{next_num} 0 obj\n<< /Type /Font /Subtype /Type1 "
            f"/BaseFont /Helvetica >>\nendobj\n".encode()
        )
        objs.append(
            f"{next_num + 1} 0 obj\n<< /Type /Font /Subtype /Type1 "
            f"/BaseFont /FixtureSubset /Encoding << /Type /Encoding "
            f"/BaseEncoding /WinAnsiEncoding /Differences [{diffs}] >> "
            f">>\nendobj\n".encode("latin-1")
        )
        next_num += 2
    objstm_num = None
    if inner:
        payload = b" ".join(d for _n, d in inner)
        offs = []
        pos = 0
        for _n, d in inner:
            offs.append(pos)
            pos += len(d) + 1  # the joining space
        hdr = (" ".join(f"{n} {o}" for (n, _d), o in zip(inner, offs)) + "\n").encode()
        objstm_data = zlib.compress(hdr + payload)
        objstm_num = next_num
        objs.append(
            f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(inner)} /First {len(hdr)} "
            f"/Filter /FlateDecode /Length {len(objstm_data)} >>\nstream\n".encode()
            + objstm_data
            + b"\nendstream\nendobj\n"
        )
    info_ref = f" /Info {info_n} 0 R".encode() if info else b""
    header = b"%PDF-1.5\n" if xref_stream else b"%PDF-1.4\n"
    body = b"".join(objs)
    xref_pos = len(header) + len(body)
    if xref_stream:
        # PDF 1.5 cross-reference stream: one W=[1 2 2] binary row per
        # object — type 1 (offset, gen) for classic objects, type 2
        # (containing ObjStm number, index within it) for compressed
        # objects — rows Up-filtered (/Predictor 12) then Flate-compressed;
        # the trailer entries (/Size /Root /Info) live in the stream dict.
        if xref_pos > 0xFFFF:
            raise ValueError("xref-stream fixture builder caps offsets at 2 bytes")
        entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
        pos = len(header)
        objnum_re = re.compile(rb"^(\d+) 0 obj")
        for o in objs:
            num = int(objnum_re.match(o).group(1))
            entries[num] = (1, pos, 0)
            pos += len(o)
        for idx, (num, _d) in enumerate(inner):
            entries[num] = (2, objstm_num, idx)
        xref_n = max(entries) + 1
        entries[xref_n] = (1, xref_pos, 0)
        rows = bytearray()
        for n in range(xref_n + 1):
            typ, f2, f3 = entries[n]
            rows += bytes([typ]) + f2.to_bytes(2, "big") + f3.to_bytes(2, "big")
        xdata = zlib.compress(png_predictor_encode(bytes(rows), 2, columns=5))
        xobj = (
            f"{xref_n} 0 obj\n<< /Type /XRef /Size {xref_n + 1} /Root 1 0 R{info_ref.decode()} "
            f"/W [1 2 2] /Filter /FlateDecode "
            f"/DecodeParms << /Predictor 12 /Columns 5 >> /Length {len(xdata)} >>\nstream\n".encode()
            + xdata
            + b"\nendstream\nendobj\n"
        )
        trailer = xobj + f"startxref\n{xref_pos}\n%%EOF\n".encode()
    else:
        trailer = (
            f"xref\n0 {len(objs) + 1}\n".encode()
            + b"0000000000 65535 f \n" * (len(objs) + 1)
            + f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{info_ref.decode()} >>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
        )
    return header + body + trailer
