"""Mechanical audit of the query-rotation invariant.

The correctness harness checks ~50 registry entries per round
(dict order = `_FRONT + mid + _BACK` in prohap_spark/queries/
__init__.py). The rotation rule promises: every registered query is
hash-green within any trailing two-round window. This script verifies
that promise against the actual CORRECTNESS_r*.json files:

  for every registered query NOT in the current front window, there
  must be a hash-green row (or a rows-only `no_oracle` row, for the
  by-design entries) in the MOST RECENT round that checked it, and
  that round must be the immediately preceding one.

Usage: python tools/rotation_audit.py [--budget 50]
Exit 0 = invariant holds; 1 = violations listed.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

BUDGET = 50
if "--budget" in sys.argv:
    BUDGET = int(sys.argv[sys.argv.index("--budget") + 1])


def main() -> int:
    from prohap_spark.queries import _ordered, oracle_sql

    rounds = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    if not rounds:
        print("no CORRECTNESS files found")
        return 1
    latest = max(rounds)
    prev = rounds[latest]

    order = _ordered()
    front = set(order[:BUDGET])
    has_oracle = set(oracle_sql())

    ever_checked = {n for r in rounds.values() for n in r}

    # Registration manifest: records the build round (latest + 1) each
    # query name was FIRST seen by this audit, so a never-driver-checked
    # query can only claim the "registered this round" exemption ONCE —
    # without it, a forgotten mid-registry query would stay exempt
    # forever and the two-round invariant would be silently waived.
    manifest_path = "/root/repo/ROTATION_MANIFEST.json"
    build_round = latest + 1
    try:
        with open(manifest_path) as f:
            first_seen = json.load(f)
    except FileNotFoundError:
        first_seen = {}
    for name in order:
        first_seen.setdefault(name, build_round)
    with open(manifest_path, "w") as f:
        json.dump(first_seen, f, indent=1, sort_keys=True)

    violations = []
    new_waiting = []
    for name in order:
        if name in front:
            continue  # will be checked this round
        row = prev.get(name)
        if row is None:
            if name not in ever_checked and first_seen[name] >= build_round:
                # brand-new registration that didn't fit the current
                # front budget: it has no prior-round obligation — it
                # becomes a rule-(a) MUST-front next round (reported,
                # not a violation)
                new_waiting.append(name)
            elif name not in ever_checked:
                violations.append(
                    f"{name}: registered in r{first_seen[name]}, never "
                    "driver-checked, and still not front-listed (rule a)"
                )
            else:
                violations.append(f"{name}: dark in r{latest} AND not front "
                                  "now (dark two rounds running)")
        elif row.get("err") == "no_oracle" and name in has_oracle:
            violations.append(f"{name}: has an oracle but r{latest} recorded "
                              "no_oracle")
        elif row.get("err") not in (None, "no_oracle"):
            violations.append(f"{name}: errored in r{latest} ({row['err']}) "
                              "but not front-listed (rule b)")
        elif row.get("err") is None and not row.get("hash_match"):
            violations.append(f"{name}: hash-red in r{latest} but not "
                              "front-listed (rule b)")

    print(f"registry: {len(order)}  front window: {len(front)} "
          f"(budget {BUDGET})  latest round: r{latest}")
    if new_waiting:
        print(f"{len(new_waiting)} new mid-registry entries awaiting their "
              f"rule-(a) front slot next round: {', '.join(new_waiting)}")
    if violations:
        print(f"\n{len(violations)} VIOLATIONS:")
        for v in violations:
            print(" -", v)
        return 1
    print("rotation invariant HOLDS: every non-front query is green in "
          f"r{latest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
