#!/usr/bin/env python
"""Regenerate the q22 golden rows (searchgov_spider_spark/golden/
q22_text_golden.json) over the sf0.01 documents table.

Unlike the q36/q37 regen scripts (which run the repo kernel and rely on
hand-verifying the diff), the expected values here are computed by an
INDEPENDENT pure-Python re-derivation written from the documented
algorithm definitions below — its own tokenizer regex, its own literal
stopword profiles, its own FNV-1a — importing nothing from
searchgov_spider_spark.kernels.  The kernel is then run as a CROSS-CHECK:
any row where the two derivations disagree aborts the regen, so a silent
kernel regression can never be re-baselined into the golden file.

Algorithm definitions (the spec both implementations follow):
  - tokenize: lowercase, ASCII ``[a-z0-9]+(?:'[a-z]+)?`` runs.
  - detect_language: over the first 400 chars, score each language profile
    as fraction-of-tokens-in-profile; best score wins, ties broken by
    alphabetical language-code order (ascending scan keeps the first);
    "en" when no tokens or all scores are 0.
  - quality_score: mean of four equal-weight components — length band
    (1.0 inside 50..5000 tokens, n/50 below, 5000/n above), alpha-char
    ratio over raw text, stopword-ratio band (1.0 iff 0.1..0.6 of tokens
    in the EN profile), mean-token-length band (1.0 iff 3..10) — rounded
    to 6 places (Python banker's round).  0.0 for empty token list.
  - document_fingerprint: min 64-bit FNV-1a (offset 0xCBF29CE484222325,
    prime 0x100000001B3) over utf-8 of space-joined token 8-grams (the
    whole token list when <= 8 tokens), reinterpreted as signed int64;
    0 for no tokens.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

# --- independent re-derivation (no kernel imports) ---------------------------

_TOK = re.compile(r"[a-z0-9]+(?:'[a-z]+)?")

# literal stopword profiles — intentionally duplicated from the algorithm
# spec, NOT imported; the cross-check below fails if they drift from the
# kernel's copy.
PROFILES = {
    "en": set(
        "the of and to in a is that it for on with as are was at by an be this have from or "
        "had not but what all were when we there can more if out so up said who they you your "
        "which their will each about how has he she his her them then than some these other".split()
    ),
    "es": set(
        "el la de que y a en un ser se no haber por con su para como estar tener le lo lo "
        "todo pero mas hacer o poder decir este ir otro ese si me ya ver porque dar cuando".split()
    ),
    "fr": set(
        "le de un etre et a il avoir ne je son que se qui ce dans en du elle au pour pas "
        "vous par sur faire plus dire me on mon lui nous comme mais pouvoir avec tout".split()
    ),
    "de": set(
        "der die und in den von zu das mit sich des auf fur ist im dem nicht ein eine als "
        "auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie".split()
    ),
    "zh": set("的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 用 们".split()),
}


def lang_of(text: str) -> str:
    toks = _TOK.findall(text[:400].lower())
    if not toks:
        return "en"
    best, best_score = "en", 0.0
    for code in sorted(PROFILES):
        score = sum(1 for t in toks if t in PROFILES[code]) / len(toks)
        if score > best_score:
            best, best_score = code, score
    return best if best_score > 0 else "en"


def quality_of(text: str) -> float:
    toks = _TOK.findall(text.lower())
    n = len(toks)
    if n == 0:
        return 0.0
    length_ok = 1.0 if 50 <= n <= 5000 else (n / 50.0 if n < 50 else 5000.0 / n)
    alpha = sum(1 for c in text if c.isalpha()) / max(1, len(text))
    swr = sum(1 for t in toks if t in PROFILES["en"]) / n
    sw_ok = 1.0 if 0.1 <= swr <= 0.6 else 0.0
    mean_len = sum(len(t) for t in toks) / n
    ml_ok = 1.0 if 3.0 <= mean_len <= 10.0 else 0.0
    return round((length_ok + alpha + sw_ok + ml_ok) / 4.0, 6)


def fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
    return h


def fingerprint_of(text: str, window: int = 8) -> int:
    toks = _TOK.findall(text.lower())
    if not toks:
        return 0
    if len(toks) <= window:
        h = fnv1a(" ".join(toks))
    else:
        h = min(fnv1a(" ".join(toks[i : i + window])) for i in range(len(toks) - window + 1))
    return h - (1 << 64) if h >= (1 << 63) else h


def main() -> None:
    import duckdb

    from searchgov_spider_spark.kernels import textproc  # cross-check only

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{os.path.join(SF_DIR, 'documents.parquet')}') ORDER BY doc_id"
    ).fetchall()
    rows = []
    mismatches = []
    for doc_id, text in docs:
        if text:
            expect = (doc_id, lang_of(text), quality_of(text), fingerprint_of(text))
            kernel = (
                doc_id,
                textproc.detect_language(text),
                textproc.quality_score(text),
                textproc.document_fingerprint(text),
            )
        else:
            expect = (doc_id, "en", 0.0, 0)
            kernel = expect
        if expect != kernel:
            mismatches.append((expect, kernel))
        rows.append(expect)
    if mismatches:
        for e, k in mismatches[:10]:
            print(f"MISMATCH independent={e} kernel={k}", file=sys.stderr)
        raise SystemExit(
            f"{len(mismatches)} rows disagree between the independent derivation and the "
            "kernel — fix whichever side regressed; the golden file was NOT rewritten"
        )
    out = os.path.join(
        os.path.dirname(__file__), "..", "searchgov_spider_spark", "golden", "q22_text_golden.json"
    )
    payload = {
        "_provenance": (
            "generated by scripts/regen_q22_golden.py: independent pure-Python derivation "
            "(own tokenizer/profiles/FNV, zero kernel imports) cross-checked row-for-row "
            f"against kernels.textproc over {SF_DIR}/documents.parquet; any disagreement "
            "aborts the regen"
        ),
        "rows": [
            {"doc_id": d, "detected_lang": lang, "quality": q, "fingerprint": fp}
            for d, lang, q, fp in rows
        ],
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {len(rows)} golden rows to {out} (independent + kernel derivations agree)")


if __name__ == "__main__":
    main()
