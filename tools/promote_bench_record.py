"""Promote the runtime bench record into the committed snapshot.

`bench.py` writes every headline-quality measurement to the gitignored
`docs/LAST_BENCH.local.json` (a bench run must never dirty the tracked
tree). This tool is the ONE way the committed `docs/LAST_BENCH.json`
snapshot — the outage fallback that ships in-repo — gets updated: an
explicit, reviewable step rather than a side effect of running the bench.

Usage: python tools/promote_bench_record.py [--check] [--round]
  --check  only report whether local and committed records differ (rc 1)
  --round  promote the e2e_round record (docs/ROUND_BENCH.local.json)
           instead of the headline images/sec record
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOCAL = REPO / "docs" / "LAST_BENCH.local.json"
COMMITTED = REPO / "docs" / "LAST_BENCH.json"
ROUND_LOCAL = REPO / "docs" / "ROUND_BENCH.local.json"
ROUND_COMMITTED = REPO / "docs" / "ROUND_BENCH.json"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--round", action="store_true")
    args = p.parse_args()
    # locals, not rebound globals: a second in-process call without
    # --round must not keep operating on the round paths
    local_path, committed_path = (
        (ROUND_LOCAL, ROUND_COMMITTED) if args.round else (LOCAL, COMMITTED))
    try:
        local = json.loads(local_path.read_text())
    except (OSError, ValueError) as e:
        print(f"no promotable local record ({local_path}): {e}", file=sys.stderr)
        return 1
    # the committed record is a driver-facing contract — validate before promoting
    missing = {"metric", "value", "unit", "vs_baseline", "detail"} - set(local)
    if missing:
        print(f"local record is missing contract fields: {sorted(missing)}", file=sys.stderr)
        return 1
    try:
        committed = json.loads(committed_path.read_text())
    except (OSError, ValueError):
        committed = None
    if local == committed:
        print("committed record already matches the local runtime record")
        return 0
    if args.check:
        print("local runtime record differs from the committed snapshot "
              f"(local value={local.get('value')}, committed="
              f"{(committed or {}).get('value')}); run without --check to promote")
        return 1
    committed_path.write_text(json.dumps(local) + "\n")
    print(f"promoted {local_path.name} -> {committed_path} (value={local['value']}, "
          f"vs_baseline={local['vs_baseline']}); commit {committed_path.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
