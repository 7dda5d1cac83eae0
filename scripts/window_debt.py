"""Window-rotation debt tracker (r6 VERDICT item #8).

The driver's correctness gate hashes only the FIRST 50 ``queries()``
entries, so window rotation is how tail queries earn fresh
driver-green rows. This script makes the rotation MECHANICAL: it
parses every ``CORRECTNESS_r*.json`` in the repo root against the
current catalog order and prints, per query, the rounds it was
driver-checked, its last fully-green round, and its staleness — so
each round's window swaps in the stalest rows instead of hand-picked
ones.

Usage: python scripts/window_debt.py [--markdown]
  --markdown  emit the table as GitHub markdown (for COVERAGE.md)

A query is 'green in round N' when its CORRECTNESS_rNN row has
rows_match and schema_match true and hash_match true-or-absent
(rows-only queries have no hash). Queries never driver-checked show
round 0 / staleness = current round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def green(row: dict) -> bool:
    return bool(row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match", True))


def value_checked(row: dict) -> bool:
    return "hash_match" in row and row["hash_match"] is not None


def main() -> None:
    markdown = "--markdown" in sys.argv
    import __spark_entry__ as entrymod
    catalog = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    rounds = load_rounds()
    latest = max(rounds) if rounds else 0

    rows = []
    for pos, name in enumerate(catalog, start=1):
        checked = sorted(r for r, d in rounds.items() if name in d)
        green_rounds = [r for r in checked if green(rounds[r][name])]
        last_green = max(green_rounds) if green_rounds else 0
        stale = latest - last_green
        rows.append({
            "pos": pos, "query": name,
            "in_window": pos <= 50,
            "oracled": name in oracles,
            "checked_rounds": checked,
            "last_green": last_green,
            "staleness": stale,
        })

    rows.sort(key=lambda r: (-r["staleness"], r["pos"]))
    if markdown:
        print("| # | query | window | oracled | driver rounds | "
              "last green | stale |")
        print("|--:|---|:-:|:-:|---|--:|--:|")
        for r in rows:
            print(f"| {r['pos']} | `{r['query']}` | "
                  f"{'W' if r['in_window'] else ''} | "
                  f"{'y' if r['oracled'] else 'rows-only'} | "
                  f"{','.join(map(str, r['checked_rounds'])) or '-'} | "
                  f"r{r['last_green']} | {r['staleness']} |")
    else:
        w = max(len(r["query"]) for r in rows)
        print(f"{'#':>3} {'query':<{w}} win orac rounds-checked "
              f"last-green stale")
        for r in rows:
            print(f"{r['pos']:>3} {r['query']:<{w}} "
                  f"{'W' if r['in_window'] else ' ':>3} "
                  f"{'y' if r['oracled'] else 'RO':>4} "
                  f"{','.join(map(str, r['checked_rounds'])) or '-':<15} "
                  f"r{r['last_green']:<9} {r['staleness']}")
    never = [r["query"] for r in rows if r["last_green"] == 0]
    stale_in_tail = [r["query"] for r in rows
                     if not r["in_window"] and r["staleness"] >= 2
                     and r["oracled"]]
    print(f"\ncatalog: {len(rows)} queries; latest driver round: "
          f"r{latest}")
    print(f"never driver-green ({len(never)}): "
          f"{', '.join(never) or 'none'}")
    print(f"oracled tail queries stale >= 2 rounds "
          f"({len(stale_in_tail)}): rotation candidates, stalest "
          f"first:\n  {', '.join(stale_in_tail) or 'none'}")


if __name__ == "__main__":
    main()
