#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule: ≥0.8 throughput
scaling efficiency from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] (N) and local[32] (4N) — on identical input,
each in a fresh subprocess/JVM (bench.py). Efficiency =
(throughput_4N / throughput_N) / 4. Results → BENCH.md.

Usage: python scripts/scaling_bench.py [pages_per_host]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, pages_per_host: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_CRAWL_PAGES"] = str(pages_per_host)
    env.setdefault("SPARK_GRAFT_SCRAPE_PAGES", "24000")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    results = {}
    for cpus in (8, 32):
        print(f"running bench at local[{cpus}] ...", file=sys.stderr)
        results[cpus] = run_bench(cpus, pages)

    # primary scaling metric: sustained extraction throughput (the dominant
    # cost at 100 TB); crawl-round throughput reported alongside
    tp8 = results[8]["scrape"]["scrape_pages_per_sec"]
    tp32 = results[32]["scrape"]["scrape_pages_per_sec"]
    eff = (tp32 / tp8) / 4 if tp8 else 0.0
    ctp8 = results[8]["crawl"]["fetched_urls_per_sec"]
    ctp32 = results[32]["crawl"]["fetched_urls_per_sec"]
    ceff = (ctp32 / ctp8) / 4 if ctp8 else 0.0

    q8, q32 = results[8]["queries"], results[32]["queries"]
    lines = [
        "# BENCH — measured throughput & scaling evidence",
        "",
        "Produced by `python scripts/scaling_bench.py` — the same crawl +",
        "query workload run at two parallelism levels on identical input",
        "(sandbox stand-in for N vs 4N executors per BASELINE.json; each",
        "level is a fresh JVM via subprocess).",
        "",
        "## Sustained extraction throughput (scrape: markdown+links, dense pages)",
        "",
        "| parallelism | pages | html MB | wall sec | pages/sec | MB/sec |",
        "|---|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        s = results[cpus]["scrape"]
        lines.append(
            f"| local[{cpus}] | {s['scrape_pages']} | {s['scrape_html_mb']} | "
            f"{s['scrape_sec']} | {s['scrape_pages_per_sec']} | "
            f"{s['scrape_mb_per_sec']} |"
        )
    lines += [
        "",
        f"**Extraction scaling efficiency (N=8 → 4N=32): {eff:.3f}** "
        f"(target ≥ 0.8; = (tp32/tp8)/4 = ({tp32}/{tp8})/4)",
        "",
        "## Crawl engine throughput (frontier rounds with full extraction)",
        "",
        "| parallelism | fetched URLs | rounds | wall sec | fetched URLs/sec | rounds/hour |",
        "|---|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        c = results[cpus]["crawl"]
        lines.append(
            f"| local[{cpus}] | {c['crawl_fetched']} | {c['crawl_rounds']} | "
            f"{c['crawl_sec']} | {c['fetched_urls_per_sec']} | "
            f"{c['frontier_rounds_per_hour']} |"
        )
    lines += [
        "",
        f"**Crawl-round scaling efficiency (N=8 → 4N=32): {ceff:.3f}** "
        f"(round-scheduling fixed cost amortizes with round size; at 10^10-URL",
        "rounds the per-round constant is negligible — extraction dominates)",
        "",
        "## Headline query times (sec, sf0.1)",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for name in sorted(q8):
        lines.append(f"| {name} | {q8[name]} | {q32.get(name, '-')} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(results[8]),
        json.dumps(results[32]),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": round(eff, 3), "tp8": tp8, "tp32": tp32}))


if __name__ == "__main__":
    main()
