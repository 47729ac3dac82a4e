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

    violations = []
    new_waiting = []
    for name in order:
        if name in front:
            continue  # will be checked this round
        row = prev.get(name)
        if row is None:
            if name not in ever_checked:
                # brand-new registration that didn't fit the current
                # front budget: it has no prior-round obligation — it
                # becomes a rule-(a) MUST-front next round (reported,
                # not a violation)
                new_waiting.append(name)
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
