"""Deterministic driver-window curation (VERDICT r12 next #7).

The driver's correctness gate samples the FIRST 50 queries in
``registry.all_queries()`` iteration order, so the window in
``plans/registry.py::_PRIORITY`` is a load-bearing contract.  Until r12
the rotation was curated by hand from the CORRECTNESS_r*.json union,
which lets freshness drift silently.  This script computes the window
mechanically from the committed artifacts, and
``tests/test_registry.py::test_priority_matches_window_builder`` pins
``_PRIORITY`` to this script's output for the committed artifact set —
a hand-edit that disagrees with the evidence ledger fails the suite.

Policy (the same one applied by hand in rounds 5-12):

1. the flagship sentinel leads (it is also the ``entry()`` smoke);
2. queries that have NEVER had a green driver row come next
   (name-sorted) — first-row evidence beats freshness;
3. remaining slots fill stalest-first: ascending newest-green round,
   name as the tiebreak;
4. module coverage fix-up: every plan module must appear (the round-4
   finding — an uncovered module produces zero driver-visible evidence
   for a whole operator family).  Missing modules swap their stalest
   query in for the freshest tail query whose module stays covered.

Only oracle-backed queries are eligible (the window must be 50/50
hash-checkable; the rows-only set is asserted empty elsewhere anyway).

Usage:
    python scripts/build_next_window.py [--artifacts DIR] [--upto N]

Prints the ``_PRIORITY`` list as Python source (annotated with each
query's newest-green round) plus the ``_WINDOW_BUILT_FROM`` pin to
paste into ``plans/registry.py``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP = "flagship_threshold_rollup"
WINDOW_SIZE = 50


def committed_rounds(artifact_dir: str) -> list[int]:
    """Round numbers of every CORRECTNESS_r*.json in the repo root."""
    rounds = []
    for path in glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return sorted(rounds)


def newest_green(artifact_dir: str, upto: int) -> dict[str, int]:
    """Newest round with a fully-green driver row, per query.

    Green = rows_match AND schema_match AND no err.  (hash_match is not
    required: rows-only lanes legitimately record a weaker check, and a
    VALUES-pinned lane's hash bit is already covered by rows+schema on
    the driver side plus the local golden.)
    """
    newest: dict[str, int] = {}
    for rnd in committed_rounds(artifact_dir):
        if rnd > upto:
            continue
        path = os.path.join(artifact_dir, f"CORRECTNESS_r{rnd:02d}.json")
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and not row.get("err"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def build_window(
    newest: dict[str, int],
    mod_of: dict[str, str],
    eligible: list[str],
    size: int = WINDOW_SIZE,
    flagship: str = FLAGSHIP,
) -> list[str]:
    """Compose the next driver window.  Pure + deterministic."""
    eligible_set = set(eligible)
    if flagship not in eligible_set:
        raise ValueError(f"flagship {flagship!r} not in eligible queries")

    window = [flagship]
    first_rows = sorted(
        q for q in eligible_set if q not in newest and q != flagship
    )
    window += first_rows

    backlog = sorted(
        (q for q in eligible_set if q in newest and q != flagship),
        key=lambda q: (newest[q], q),
    )
    for q in backlog:
        if len(window) >= size:
            break
        window.append(q)

    if len(window) < size:
        raise ValueError(
            f"only {len(window)} eligible queries for a {size}-slot window"
        )

    # Module coverage fix-up.  Swap each missing module's stalest query
    # in for the freshest tail query whose module remains covered after
    # removal.  Iterate missing modules stalest-candidate-first so the
    # outcome is independent of dict ordering.
    all_modules = sorted(set(mod_of[q] for q in eligible_set))
    while True:
        covered = {mod_of[q] for q in window}
        missing = [m for m in all_modules if m not in covered]
        if not missing:
            break
        # stalest candidate per missing module
        candidates = {}
        for m in missing:
            pool = sorted(
                (q for q in eligible_set if mod_of[q] == m and q not in window),
                key=lambda q: (newest.get(q, 0), q),
            )
            if not pool:
                raise ValueError(f"module {m!r} has no eligible query")
            candidates[m] = pool[0]
        # evict from the tail: freshest window row whose module keeps
        # >=2 representatives (never evict flagship or a first-row)
        from collections import Counter

        counts = Counter(mod_of[q] for q in window)
        protected = {flagship, *(q for q in window if q not in newest)}
        for m in sorted(missing, key=lambda m: (newest.get(candidates[m], 0), m)):
            evict = None
            for q in sorted(
                (q for q in window if q not in protected and counts[mod_of[q]] > 1),
                key=lambda q: (-newest.get(q, 0), q),
            ):
                evict = q
                break
            if evict is None:
                raise ValueError(f"cannot make room for module {m!r}")
            counts[mod_of[evict]] -= 1
            counts[m] += 1
            window[window.index(evict)] = candidates[m]
    return window


def registry_inputs():
    """(mod_of, eligible) from the live registry."""
    import importlib

    from species_range_data_pipeline_spark.plans import registry

    mod_of: dict[str, str] = {}
    for m in registry._MODULE_NAMES:
        mod = importlib.import_module(
            f"species_range_data_pipeline_spark.plans.{m}"
        )
        for q in getattr(mod, "QUERIES", {}):
            mod_of[q] = m
    oracles = set(registry.all_oracles())
    eligible = sorted(q for q in mod_of if q in oracles)
    return mod_of, eligible


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--upto", type=int, default=None,
                    help="newest artifact round to consume (default: all committed)")
    args = ap.parse_args()

    rounds = committed_rounds(args.artifacts)
    upto = args.upto if args.upto is not None else (rounds[-1] if rounds else 0)
    newest = newest_green(args.artifacts, upto)
    mod_of, eligible = registry_inputs()
    window = build_window(newest, mod_of, eligible)

    print(f"_WINDOW_BUILT_FROM = {upto}  # newest CORRECTNESS artifact consumed")
    print("_PRIORITY = [")
    for q in window:
        rnd = newest.get(q)
        note = f"r{rnd}" if rnd else "FIRST driver row"
        print(f'    "{q}",  # {note} ({mod_of[q]})')
    print("]")


if __name__ == "__main__":
    main()
