#!/usr/bin/env python
"""Round-start hygiene in one command (VERDICT r6 item 1).

Run FIRST THING each round, after the driver's end-of-round commit has
landed the new CORRECTNESS/BENCH artifacts:

1. regenerates the VERIFICATION.md §8 staleness table from the newest
   evidence (otherwise tests/test_staleness_budget.py's tripwire fails
   all round);
2. reports whether the committed bench_detail.json sidecar still ties
   to the newest BENCH anchor (if not, the regression gate silently
   degrades to min-to-min — recommit the matching sidecar);
3. lists which FORCE_RECHECK / REGISTERED_IN_ROUND entries still bind —
   satisfied entries must be pruned (their guard tests fail otherwise).

Exit code 0 = nothing left to do by hand except any listed prunes.

ATOMICITY (ADVICE r7): the staleness/prune guard tests intentionally go
red the moment the driver's evidence files land and stay red until the
prune + regen commit — the window between the driver's end-of-round
commit and this script's commit is EXPECTED to have a red suite, and the
guards' failure messages say so. Keep the prune edits, the regenerated
VERIFICATION.md §8, and any refreshed bench_detail.json in ONE commit so
the repo is never left mid-transition.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import __spark_entry__ as E  # noqa: E402
from tools.staleness_table import REGISTERED_IN_ROUND  # noqa: E402


def main() -> int:
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "staleness_table.py")], check=True
    )

    import bench

    anchors = sorted(
        ROOT.glob("BENCH_r*.json"),
        key=lambda p: int("".join(c for c in p.stem if c.isdigit()) or 0),
    )
    if anchors:
        parsed = json.loads(anchors[-1].read_text()).get("parsed") or {}
        sf = parsed.get("sf")
        # PIN the evidence under a round-stamped name the moment the
        # anchor lands: the floating bench_detail.json is overwritten
        # by every local bench run (round 9 lost the r8-driver medians
        # exactly that way); _sidecar_medians reads the pinned copy
        # first. Validation runs UNCONDITIONALLY — a wrong existing pin
        # must be reported even when no sidecar currently resolves
        # (ADVICE r9: the `not pinned.exists()` guard made a bad pin
        # sticky and silent).
        pinned = ROOT / anchors[-1].name.replace("BENCH_", "bench_detail_")
        floating = ROOT / "bench_detail.json"

        def _ties(detail: dict) -> bool:
            # sf AND the full per-query min map must match the anchor
            # (ADVICE r9: queries-only comparison could pin a
            # different-sf sidecar whose timings happened to collide)
            return (
                detail.get("sf") == parsed.get("sf")
                and bool(detail.get("queries"))
                and detail.get("queries") == parsed.get("queries")
            )

        floating_detail = (
            json.loads(floating.read_text()) if floating.exists() else {}
        )
        if pinned.exists() and not _ties(json.loads(pinned.read_text())):
            if _ties(floating_detail):
                pinned.write_text(floating.read_text())
                print(
                    f"RE-PINNED {pinned.name}: the existing pin failed"
                    " the sf+queries tie check; replaced from the"
                    " matching floating sidecar (commit it)"
                )
            else:
                print(
                    f"PINNED SIDECAR MISMATCH: {pinned.name} does not"
                    f" tie to {anchors[-1].name} (sf+queries check) and"
                    " no matching floating sidecar exists — the median"
                    " gate will stay degraded until a sidecar from the"
                    " anchor's run is recommitted under that name"
                )
        elif not pinned.exists() and _ties(floating_detail):
            pinned.write_text(floating.read_text())
            print(f"pinned sidecar -> {pinned.name} (commit it)")

        med = (
            bench._sidecar_medians(parsed, sf, anchors[-1].name)
            if sf is not None
            else {}
        )
        if med or parsed.get("queries_median"):
            print(f"sidecar OK: median gate anchored to {anchors[-1].name}")
        else:
            print(
                f"SIDECAR STALE: no sidecar ties to"
                f" {anchors[-1].name} — gate degraded to min-to-min;"
                " recommit the sidecar from that run"
            )

    verdicts = E._load_verdicts()
    prunes: list[str] = []
    for name, min_round in E.FORCE_RECHECK.items():
        row = verdicts.get(name, (0, False, False))
        ok = row[0] >= min_round and row[1] and (row[2] if len(row) > 2 else row[1])
        state = "SATISFIED -> prune" if ok else "binding"
        if ok:
            prunes.append(f"FORCE_RECHECK[{name!r}]")
        print(f"FORCE_RECHECK {name} (r{min_round}+): {state}")
    for name, first_round in REGISTERED_IN_ROUND.items():
        row = verdicts.get(name)
        # rows predating the entry's round don't satisfy it: a promoted
        # query's old no_oracle rows attest the pre-promotion shape
        if row is not None and row[0] >= first_round:
            prunes.append(f"REGISTERED_IN_ROUND[{name!r}]")
            print(f"REGISTERED_IN_ROUND {name}: row landed -> prune")
        else:
            print(f"REGISTERED_IN_ROUND {name} (r{first_round}+): pending")
    if prunes:
        print("prune these entries, then rerun:", ", ".join(prunes))
    print("done — commit the regenerated VERIFICATION.md if it changed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
