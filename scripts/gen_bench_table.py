#!/usr/bin/env python
"""Regenerate BENCH.md's per-query table from a bench.py JSON line and a
bench_duckdb.py JSON line, preserving the hand-curated per-query notes
already in BENCH.md. The header prose stays manual — only the table block
(from the `| query |` header to the last `|` row) is replaced in place.

Usage:
    python bench.py > /tmp/spark.json
    python scripts/bench_duckdb.py > /tmp/duck.json
    python scripts/gen_bench_table.py /tmp/spark.json /tmp/duck.json
"""

from __future__ import annotations

import json
import re
import sys


def load_line(path: str) -> dict:
    with open(path) as f:
        lines = [l for l in f if l.strip().startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    spark_json, duck_json = sys.argv[1], sys.argv[2]
    bench_md = sys.argv[3] if len(sys.argv) > 3 else "BENCH.md"
    spark = load_line(spark_json)
    duck = load_line(duck_json)

    with open(bench_md) as f:
        md = f.read()

    # existing notes: short name (qNN) -> note, from current table rows
    notes: dict[str, str] = {}
    for m in re.finditer(
        r"^\| (q\w+) \| [\d.]+ \| [\d.]+ \| [^|]+ \| (.*) \|$", md, re.M
    ):
        notes[m.group(1).split("_")[0]] = m.group(2).strip()

    sq, dq = spark["queries"], duck["queries"]
    # spark keys are short (q01); duckdb keys are full names
    full_by_short = {k.split("_")[0]: k for k in dq}
    rows = []
    for short in sorted(sq, key=lambda s: full_by_short.get(s, s)):
        full = full_by_short.get(short, short)
        s, d = sq[short], dq.get(full)
        if d is None:
            continue
        ratio = f"{s / d:.1f}×" if d > 0 else "—"
        rows.append(f"| {full} | {s:.2f} | {d:.3f} | {ratio} | {notes.get(short, '')} |")

    table = (
        "| query | spark s | duckdb s | ratio | note |\n|---|---|---|---|---|\n"
        + "\n".join(rows)
    )
    new_md, n = re.subn(
        r"\| query \| spark s \| duckdb s \| ratio \| note \|\n(?:\|.*\|\n?)+",
        lambda _m: table + "\n",
        md,
    )
    if n != 1:
        sys.exit(f"expected exactly one table block in {bench_md}, found {n}")
    with open(bench_md, "w") as f:
        f.write(new_md)
    print(
        f"table rewritten: {len(rows)} rows; totals spark={spark['value']:.1f}s "
        f"duckdb={duck['value']:.1f}s ratio={spark['value'] / duck['value']:.1f}x"
    )


if __name__ == "__main__":
    main()
