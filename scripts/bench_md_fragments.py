#!/usr/bin/env python3
"""Render BENCH.md's numeric tables from BENCH_full.json.

Rounds 2-5 repeatedly shipped a BENCH.md whose prose quoted one run while
the committed artifact held another.  This script is the single source of
truth for the doc's numbers: run it after a full `python3 bench.py` and
paste (or diff-check) the emitted fragments into BENCH.md.

Usage: python3 scripts/bench_md_fragments.py [BENCH_full.json]
"""
from __future__ import annotations

import json
import sys


def fmt_rate(x: float) -> str:
    return f"{x:,.0f}"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    d = json.load(open(path))
    ex = d["extras"]
    sc = d["scaling"]
    lo_runs = ex["crawl"]["scaling_local2_runs"]
    hi_runs = ex["crawl"]["scaling_local8_runs"]
    st = ex["stateful"]
    head = ex["crawl"][f"local{lo_runs[0]['cores'] * 0 + 32}" if "local32" in ex["crawl"] else "local32"]

    def sum_rate(runs, wall_key, fetched_key):
        wall = sum(r[wall_key] for r in runs)
        return sum(r[fetched_key] for r in runs) / wall if wall else 0.0

    print("## Scaling table")
    print("| | local[2] | local[8] |")
    print("|---|---|---|")
    print(
        f"| billed URLs/s (summed walls) | {fmt_rate(sum_rate(lo_runs, 'billed_wall_s', 'billed_fetched'))} "
        f"| {fmt_rate(sum_rate(hi_runs, 'billed_wall_s', 'billed_fetched'))} |"
    )
    print(
        f"| deep-round URLs/s | {fmt_rate(sum_rate(lo_runs, 'deep_wall_s', 'deep_fetched'))} "
        f"| {fmt_rate(sum_rate(hi_runs, 'deep_wall_s', 'deep_fetched'))} |"
    )
    def walls(runs):
        return ", ".join(f"{r['billed_wall_s']:.1f} s" for r in runs)

    print(f"| per-run billed walls | {walls(lo_runs)} | {walls(hi_runs)} |")
    # round_selected holds only the MEASURED (resumed) rounds — the seed
    # rounds run in a separate unbilled seeding crawl and never appear here
    sel_lo = [r["round_selected"] for r in lo_runs]
    sel_hi = [r["round_selected"] for r in hi_runs]
    same = "identical" if sel_lo == sel_hi else f"{sel_hi} (MISMATCH!)"
    print(f"| measured rounds (selected) | {sel_lo[0]} x{len(sel_lo)} | {same} |")
    print(f"| tail rounds (unbilled suffix) | {[r['tail_selected'] for r in lo_runs]} | {[r['tail_selected'] for r in hi_runs]} |")
    print(
        f"| drain/stop tail rounds | {sc['tail_rounds_unbilled_low']} | {sc['tail_rounds_unbilled_high']} |"
    )
    print()
    print(f"- `efficiency` (deep rounds): **{sc['efficiency']}**")
    print(f"- `whole_crawl_efficiency` (billed window): **{sc['whole_crawl_efficiency']}**")
    print(f"- `all_rounds_efficiency` (nothing excluded): **{sc['all_rounds_efficiency']}**")
    print(f"- per-pair deep efficiencies: {sc['per_pair_efficiency']}")
    print(
        f"- machine_ceiling_efficiency **{sc['machine_ceiling_efficiency']}** -> "
        f"ceiling_normalized_efficiency **{sc['ceiling_normalized_efficiency']}**"
    )
    gates = []
    for r in lo_runs + hi_runs:
        lg = r.get("load_gate", {})
        ext = r.get("external_cpu") or {}
        gates.append((len(lg.get("attempts", [])), ext.get("external_cores_avg")))
    print(f"- load-gate (attempts, avg external cores) per scaling phase: {gates}")

    print()
    print("## Stateful politeness")
    print("| | local[2] | local[8] | efficiency |")
    print("|---|---|---|---|")
    print(
        f"| rows/s (summed) | {fmt_rate(st['low']['rows_per_sec'])} "
        f"| {fmt_rate(st['high']['rows_per_sec'])} | **{st['efficiency']}** |"
    )
    print(
        f"| whole-query rows/s (everything billed) | {fmt_rate(st['low']['whole_query_rows_per_sec'])} "
        f"| {fmt_rate(st['high']['whole_query_rows_per_sec'])} | **{st['whole_query_efficiency']}** |"
    )

    print()
    print("## Headline crawl (local[32])")
    print(
        f"wall {head['wall_s']:.1f} s | {fmt_rate(head['urls_per_sec'])} URLs/s | "
        f"billed {fmt_rate(head['billed_urls_per_sec'])} | gate attempts "
        f"{len(head.get('load_gate', {}).get('attempts', []))} | external cpu {head.get('external_cpu')}"
    )

    print()
    print("## Seenjoin crossover")
    print("| seen rows | bucketed anti-join | plain scan (AQE) | winner |")
    print("|---|---|---|---|")
    for p in ex["seenjoin"]["points"]:
        b, pl = p["bucketed"]["median_s"], p["plain"]["median_s"]
        win = "**bucketed**" if p["bucketed_wins"] else "plain"
        print(f"| {p['seen_rows']:,} | {b:.2f} s | {pl:.2f} s | {win} |")
    print(f"crossover_seen_rows: {ex['seenjoin'].get('crossover_seen_rows', d.get('seenjoin', {}).get('crossover_seen_rows'))}")

    print()
    print("## Per-query medians (s)")
    print("| query | median | min | max |")
    print("|---|---|---|---|")
    for q, s in ex["query_stats"].items():
        print(f"| {q} | {s['median']:.2f} | {s['min']:.2f} | {s['max']:.2f} |")


if __name__ == "__main__":
    main()
