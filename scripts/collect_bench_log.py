"""Collect BENCH_SECTION lines from bench worker logs into one JSON doc.

The builder's cache-seeding runs (`python bench.py --worker a,b,c`, see
NOTES_ROUND5.md) stream one `BENCH_SECTION {...}` line per section; this
merges any number of such logs (later files win on name collisions) into
``docs/bench_builder_r5.json`` so the builder-measured numbers carry
provenance separate from the driver-captured BENCH_r*.json.

Usage: python scripts/collect_bench_log.py LOG [LOG...] [-o OUT]
"""

from __future__ import annotations

import json
import sys

SECTION = "BENCH_SECTION "
FAIL = "BENCH_SECTION_FAIL "


def main() -> None:
    args = sys.argv[1:]
    out_path = "docs/bench_builder_r5.json"
    if "-o" in args:
        i = args.index("-o")
        out_path = args[i + 1]
        del args[i:i + 2]
    merged: dict = {"sections": {}, "extras": {}, "failed": {}}
    for path in args:
        with open(path, errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if line.startswith(SECTION):
                    rec = json.loads(line[len(SECTION):])
                    merged["sections"][rec["name"]] = rec.get("wall_s")
                    merged["extras"].update(rec.get("extras", {}))
                    merged["failed"].pop(rec["name"], None)
                elif line.startswith(FAIL):
                    rec = json.loads(line[len(FAIL):])
                    merged["failed"][rec["name"]] = rec.get("error")
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(json.dumps(merged, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
