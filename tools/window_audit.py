"""Driver-window rotation audit: is the 50-entry recorded prefix of
``queries()`` the right 50 this round?

The external driver hash-records only the first WINDOW entries of
``queries()`` per round, so stale queries must rotate back in via
``_PRIORITY`` (artigraph_spark/queries/__init__.py). This tool
recomputes each query's last-recorded round from the CORRECTNESS_r*.json
files and checks the current prefix against the rotation policy:

  1. every never-recorded oracle-bearing query is in the window;
  2. nothing in the window has a fresher last-recorded round than
     something outside it (monotone staleness, modulo the declared
     fresh set — the impl/oracle-changed queries of the CURRENT round,
     read from ``artigraph_spark.queries.ROUND_FRESH`` so a bare run
     is reproducible; ``--fresh`` overrides for what-if checks);
  3. the window is exactly WINDOW entries and free of rows-only
     queries whose ``*_checked`` twins carry the signal.

Usage: python tools/window_audit.py [--fresh name1,name2,...]
Exit code 0 = window composition is sound.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WINDOW = 50
# r12: empty — the four former rows-only twins (minhash_lsh_pairs,
# dedup_clusters, simhash_fingerprints, cosine_topk_lsh) gained full
# first-party oracles, so a window slot is no longer wasted on them.
ROWS_ONLY_TWINNED: set[str] = set()


def last_recorded(repo: Path) -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        data = json.loads(f.read_text())
        for name in data.get("queries", data):
            out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    from artigraph_spark.queries import ROUND_FRESH

    fresh: set[str] = set(ROUND_FRESH)
    args = sys.argv[1:]
    if args and args[0].startswith("--fresh="):
        fresh = set(args[0][len("--fresh="):].split(","))
        args = args[1:]
    elif args and args[0] == "--fresh":
        if len(args) < 2:
            print("error: --fresh requires a comma-separated query list")
            return 2
        fresh = set(args[1].split(","))
        args = args[2:]
    if args:
        # A typo'd flag silently auditing with an EMPTY fresh set produces a
        # misleading staleness failure (or false confidence) — reject it.
        print(f"error: unrecognized arguments {args!r}")
        return 2

    from artigraph_spark.queries import oracle_sql, queries

    repo = Path(__file__).resolve().parent.parent
    last = last_recorded(repo)
    names = list(queries())
    osql = oracle_sql()
    window, rest = names[:WINDOW], names[WINDOW:]

    failures: list[str] = []
    never = [n for n in names if n not in last and n in osql]
    for n in never:
        if n not in window:
            failures.append(f"never-recorded oracle query OUT of window: {n}")
    for n in window:
        if n in ROWS_ONLY_TWINNED:
            failures.append(f"rows-only twinned query wastes a slot: {n}")
    if len(window) != WINDOW:
        failures.append(f"registry smaller than the window: {len(window)}")

    # monotone staleness: the freshest round inside the window (ignoring
    # declared-fresh and never-recorded) must not exceed the stalest
    # outside it
    in_rounds = [
        last[n] for n in window if n in last and n not in fresh
    ]
    out_rounds = [
        (last[n], n) for n in rest if n in last and n in osql
    ]
    if in_rounds and out_rounds:
        worst_out = min(out_rounds)
        best_in = max(in_rounds)
        if best_in > worst_out[0]:
            inside = [n for n in window if last.get(n) == best_in and n not in fresh]
            failures.append(
                f"window holds r{best_in}-recorded {inside[:3]}... while "
                f"r{worst_out[0]}-stale {worst_out[1]!r} sits outside"
            )

    hist: dict[int, int] = {}
    for n in window:
        hist[last.get(n, 0)] = hist.get(last.get(n, 0), 0) + 1
    print(f"window composition by last-recorded round (0 = never): {dict(sorted(hist.items()))}")
    print(f"never-recorded oracle queries: {never or 'none'}")
    if failures:
        for f in failures:
            print(f"AUDIT FAIL: {f}")
        return 1
    print(f"window audit OK: {WINDOW}-entry prefix is the right rotation")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
