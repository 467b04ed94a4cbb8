#!/usr/bin/env python
"""Regenerate registry.py's verified-name tiers from the CORRECTNESS files.

Run at the START of each round, after the driver writes
``CORRECTNESS_r{N}.json``:

    python tools/rotate_verified.py

Prints the three pieces the ordering needs:
  * names hash-green in ANY round (cumulative evidence),
  * names hash-green in the LATEST round (freshest — belongs below the
    verification fold),
  * names with NO hash-green row anywhere (must rank FIRST, inside the
    driver's ~50-entry verification window).

Paste-ready frozenset literals are emitted for `_STALE_R1`-style tiers;
adapt the tier variable names to the round. The driver verifies queries()
dict order, so this rotation is what decides which queries get fresh
driver evidence each round.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    catalog = set(load_all())
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json files found (run from repo root)")
    green_by_round: dict[str, set[str]] = {}
    for f in files:
        rows = json.load(open(f))
        green_by_round[f] = {n for n, v in rows.items() if v.get("hash_match")}
        not_green = {n: v.get("err") for n, v in rows.items() if not v.get("hash_match")}
        print(f"{f}: {len(rows)} rows, {len(green_by_round[f])} hash-green, "
              f"not green: {not_green or '{}'}")

    latest = files[-1]
    cumulative = set().union(*green_by_round.values())
    never = sorted(catalog - cumulative)
    stale_order = sorted(catalog & cumulative - green_by_round[latest])
    print(f"\ncumulative hash-green: {len(cumulative & catalog)}/{len(catalog)}")
    print(f"never hash-green (rank these FIRST): {never}")
    print(f"green before {latest} but not in it (refresh next): {len(stale_order)} names")

    def emit(name: str, names: set[str]) -> None:
        body = ",\n    ".join(
            ", ".join(f'"{n}"' for n in chunk)
            for chunk in _chunks(sorted(names), 4)
        )
        print(f"\n{name} = frozenset((\n    {body},\n))")

    # one tier per LATEST-green round: the registry ranks stalest-first,
    # so each tier below pastes directly into registry.py (oldest tier
    # ranks first after the brand-new queries; the latest-round tier sits
    # below the driver's ~50-entry verification fold)
    latest_round: dict[str, str] = {}
    for f in files:  # chronological — later rounds overwrite
        for n in green_by_round[f]:
            latest_round[n] = f
    for f in files:
        names = {n for n, lf in latest_round.items() if lf == f} & catalog
        if names:
            rn = f.replace("CORRECTNESS_r", "").replace(".json", "").lstrip("0")
            emit(f"_LATEST_R{rn}", names)


def _chunks(seq: list[str], n: int):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


if __name__ == "__main__":
    main()
