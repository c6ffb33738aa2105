#!/usr/bin/env python
"""Compute the NEXT round's external-evidence sample window.

The external correctness driver samples the FIRST 50 names of
``registry._SAMPLE_ORDER`` each round, so the window must rotate every
round or evidence goes stale (the round-9 failure mode this tool
exists to prevent). Policy, per the standing judge contract:

1. stalest-first: every query whose most recent external sample is
   oldest fills the front of the window (union over CORRECTNESS_r*.json,
   latest round per name);
2. the pinned verdict rows (``*_recall`` / ``*_consistency`` /
   ``*_verdict``) appear in EVERY window — they are the oracle-checked
   external evidence for the rows-only sketch queries;
3. zero-evidence queries (registered but never sampled — usually new
   this round) close the window;
4. everything else follows in staleness order for any wider window.

Run from the repo root AFTER the round's driver artifacts land:

    python tools/next_window.py            # print the proposed tuple
    python tools/next_window.py --check    # verify the CURRENT window
                                           # already satisfies policy
                                           # (exit 1 with a diff if not)

The output is a ready-to-paste ``_SAMPLE_ORDER`` literal; the check
mode is a pre-driver gate: run it before freezing the registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
PIN_SUFFIXES = ("_recall", "_consistency", "_verdict")


def latest_evidence(pattern: str = "CORRECTNESS_r*.json") -> dict[str, int]:
    """name -> most recent round with an external sample."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"r0*(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        queries = data.get("queries", data)
        names = queries.keys() if isinstance(queries, dict) else (
            q["name"] for q in queries
        )
        for name in names:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def proposed_order(
    registered: list[str],
    latest: dict[str, int],
    rows_only: set[str] | None = None,
    forced: tuple[str, ...] = (),
) -> list[str]:
    """The full rotation order under the policy above. ``registered``
    supplies the tie-break (registration order) and the universe.

    ``forced`` (registry.FORCE_NEXT) names queries whose SEMANTICS
    changed this round: they re-enter the window regardless of how
    fresh their last sample is — stale-but-green evidence describes
    code that no longer exists. They displace the least-stale lead
    entries (which simply wait one more round).

    Among equally-stale queries, rows-only sketches (no oracle — their
    value evidence is the pinned ``*_recall``/``*_verdict`` sibling
    that rides in EVERY window) are the cheapest to displace when the
    window is tight, so they sort behind oracle-checked peers."""
    pos = {n: i for i, n in enumerate(registered)}
    rows_only = rows_only or set()
    fset = set(forced)
    pinned = [n for n in registered if n.endswith(PIN_SUFFIXES)]
    force = [n for n in registered if n in fset and n not in pinned]
    zero = [
        n for n in registered
        if n not in latest and n not in pinned and n not in force
    ]
    rest = [
        n for n in registered
        if n not in zero and n not in pinned and n not in force
    ]
    # stalest first; rows-only sketches last within a staleness class;
    # then by name for a stable, reviewable diff
    rest.sort(key=lambda n: (latest.get(n, 0), n in rows_only, n))
    n_lead = max(0, WINDOW - len(pinned) - len(zero) - len(force))
    lead, tail = rest[:n_lead], rest[n_lead:]
    order = lead + force + pinned + zero + tail
    assert sorted(order, key=pos.get) == registered
    return order


def main() -> int:
    import full_docker_etl_spark.registry as registry
    from full_docker_etl_spark.registry import _SAMPLE_ORDER, all_specs

    specs = all_specs()
    registered = list(specs)
    rows_only = {n for n, s in specs.items() if s.oracle is None}
    forced = tuple(getattr(registry, "FORCE_NEXT", ()))
    latest = latest_evidence()
    unknown = sorted(set(latest) - set(registered))
    if unknown:
        print(f"note: {len(unknown)} evidence names no longer registered: "
              f"{unknown}", file=sys.stderr)
    order = proposed_order(registered, latest, rows_only, forced)

    if "--check" in sys.argv:
        current = [n for n in _SAMPLE_ORDER if n in set(registered)][:WINDOW]
        want = order[:WINDOW]
        # a FORCE_NEXT entry sampled by the newest recorded round may
        # already be served: if that round ran on the POST-change code,
        # leaving it forced burns a window slot repeating fresh
        # evidence. The tool can't see which code the round ran on —
        # surface the decision instead of guessing.
        newest = max(latest.values(), default=0)
        served = sorted(n for n in forced if latest.get(n) == newest)
        if served:
            print(
                f"note: FORCE_NEXT entries with r{newest} evidence: "
                f"{served} — if r{newest} ran on the post-change code, "
                "reset FORCE_NEXT; if the change landed after "
                f"r{newest}, keep them forced.",
                file=sys.stderr,
            )
        if set(current) == set(want):
            print(f"OK: current window matches policy ({WINDOW} slots, "
                  f"{sum(1 for n in current if n not in latest)} zero-evidence, "
                  f"{sum(1 for n in current if n.endswith(PIN_SUFFIXES))} pinned)")
            return 0
        missing = sorted(set(want) - set(current))
        extra = sorted(set(current) - set(want))
        print("STALE WINDOW — rotate before the driver runs.")
        print(f"  should enter: {missing}")
        print(f"  may leave:    {extra}")
        return 1

    if "--plan-next" in sys.argv:
        # The ROUND-AFTER-NEXT's window, simulated: stamp the proposed
        # window as sampled by (newest round + 1) and re-run the
        # policy — this is the arithmetic the registry's "next round
        # plan" comment must record at each freeze, automated (it was
        # hand-simulated in r16/r17; a hand slip wrote a wrong 33-row
        # claim in an intermediate r17 comment before simulation
        # caught it).
        nxt = dict(latest)
        rnd = max(latest.values(), default=0) + 1
        for n in order[:WINDOW]:
            nxt[n] = rnd
        by_round = {}
        for n in registered:
            by_round[nxt.get(n, 0)] = by_round.get(nxt.get(n, 0), 0) + 1
        future = proposed_order(registered, nxt, rows_only, ())[:WINDOW]
        lead = [n for n in future if not n.endswith(PIN_SUFFIXES)]
        print(f"# post-r{rnd} staleness: {dict(sorted(by_round.items()))}")
        print(f"# r{rnd + 1} window = {len(lead)} lead rows + "
              f"{WINDOW - len(lead)} pinned; lead (in order):")
        for n in lead:
            print(f"#   {n} (r{nxt.get(n, 0) or 'never'})")
        print("# (new queries / FORCE_NEXT registered next round "
              "displace from the tail)")
        return 0

    by_round: dict[int, int] = {}
    for n in registered:
        by_round[latest.get(n, 0)] = by_round.get(latest.get(n, 0), 0) + 1
    print(f"# staleness: {dict(sorted(by_round.items()))} (0 = never sampled)")
    print("_SAMPLE_ORDER: tuple[str, ...] = (")
    for i, n in enumerate(order):
        if i == WINDOW:
            print(f"    # ---- window boundary ({WINDOW}) ----")
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
