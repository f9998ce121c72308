"""The driver-window rotation contract, enforced against the committed
correctness history.

The external correctness gate samples the FIRST 50 entries of
``cyclebane_spark.queries._PRIORITY`` each round. The rotation rule
(VERDICT r4, restated r6 "Next round #4") orders the window:

1. driver-RED rows (red in the newest committed CORRECTNESS file);
2. queries whose code path changed since their last green row — declared
   per round in ``_CHANGED_THIS_ROUND`` (a shared-helper edit counts);
3. never-seen registrations (in the registry, absent from every
   committed CORRECTNESS file);
4. oldest-green backfill: remaining slots go to the queries whose newest
   driver-green row is OLDEST (alphabetical within a round).

The rotation was hand-maintained prose through round 6; one slip silently
wastes a round of driver signal, so this test recomputes the required
window from the committed ``CORRECTNESS_r0*.json`` history and fails when
a stale query is omitted or a fresh one squats on a slot.

Phase stability (ADVICE r7): the window for round N is rotated while only
rounds < N have results on disk; the driver then drops round N's file into
the tree WITHOUT any code change. The contract is therefore evaluated
against correctness files for rounds < ``_WINDOW_ROUND`` only — the exact
information the rotation was built from. Forgetting to rotate (and bump
``_WINDOW_ROUND``) next round still fails, which is the signal we want.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _is_green(rec: dict) -> bool:
    return (
        rec.get('err') is None
        and bool(rec.get('rows_match'))
        and bool(rec.get('schema_match'))
        and rec.get('hash_match') is not False
    )


def _history(window_round: int):
    """(newest_green, reds, seen): per-query newest green round, the red
    set of the newest considered round, and every name any round saw.

    Only rounds < ``window_round`` are considered — the history the
    rotation was built from (see module docstring)."""
    files = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, 'CORRECTNESS_r*.json'))
            if int(re.search(r'_r0*(\d+)', p).group(1)) < window_round
        ),
        key=lambda p: int(re.search(r'_r0*(\d+)', p).group(1)),
    )
    assert files, 'no committed CORRECTNESS files — contract unverifiable'
    newest_green: dict[str, int] = {}
    seen: set[str] = set()
    reds: set[str] = set()
    for path in files:
        rnd = int(re.search(r'_r0*(\d+)', path).group(1))
        data = json.load(open(path))
        seen.update(data)
        reds = {n for n, rec in data.items() if not _is_green(rec)}
        for name, rec in data.items():
            if _is_green(rec):
                newest_green[name] = max(newest_green.get(name, 0), rnd)
    # a seen-but-NEVER-green query (red once, then dropped from every later
    # window) is the stalest possible signal: rank it round 0 so the tier-4
    # ordering surfaces it instead of silently excluding it (and so a
    # backfill comparison can never KeyError on it)
    for name in seen:
        newest_green.setdefault(name, 0)
    return newest_green, reds, seen


def test_priority_window_satisfies_rotation_contract():
    from cyclebane_spark.queries import (
        _CHANGED_THIS_ROUND,
        _PRIORITY,
        _WINDOW_ROUND,
        registry,
    )

    names = set(registry())
    assert len(_PRIORITY) == len(set(_PRIORITY)), 'duplicate window entries'
    window = list(_PRIORITY[:WINDOW])
    newest_green, reds, seen = _history(_WINDOW_ROUND)

    # tiers 1-3 are hard requirements on window MEMBERSHIP
    required = (reds & names) | set(_CHANGED_THIS_ROUND) | (names - seen)
    if len(required) <= WINDOW:
        missing = required - set(window)
        assert not missing, (
            f'red/changed/never-seen rows outside the window: {sorted(missing)}'
        )
    else:
        # Overflow rule (round 11, the optimization round changed more
        # query paths than one window holds): the window must consist
        # ENTIRELY of required entries — no backfill may squat while a
        # required row waits — and the slots go to the required entries
        # with the STALEST newest-green driver signal (never-seen rank 0,
        # then (round, name) ascending). The overflow stays
        # changed-since-green and is forced to the head of the NEXT
        # round's window by this same test once that round's results land.
        squatters = set(window) - required
        assert not squatters, (
            f'required tiers overflow the window but non-required rows '
            f'hold slots: {sorted(squatters)}'
        )
        inside = set(window)
        worst_in = max((newest_green.get(n, 0), n) for n in inside)
        best_out = min(
            (newest_green.get(n, 0), n) for n in required - inside
        )
        assert worst_in < best_out, (
            f'required overflow is not stalest-first: window holds '
            f'{worst_in} while {best_out} waits outside'
        )

    # tier 4: every remaining slot goes to the stalest greens. No query
    # OUTSIDE the window may be staler than a backfill query INSIDE it.
    backfill = [n for n in window if n not in required]
    outside = [n for n in names - set(window) if n in newest_green]
    if backfill and outside:
        # alphabetical within a round ⇒ compare (round, name) tuples
        worst_in = max((newest_green[n], n) for n in backfill)
        best_out = min((newest_green[n], n) for n in outside)
        assert worst_in < best_out, (
            f'window backfill {worst_in} is fresher than omitted {best_out}'
            ' — a staler query lost its slot'
        )

    # the window must be FULL whenever the registry can fill it
    assert len(window) == min(WINDOW, len(names))

    # _WINDOW_ROUND must track the committed history: equal to the newest
    # committed round + 1 at builder-commit time, or equal to it right
    # after the driver drops that round's results. Anything else means the
    # pin drifted (e.g. two rounds passed without a rotation).
    all_rounds = [
        int(re.search(r'_r0*(\d+)', p).group(1))
        for p in glob.glob(os.path.join(REPO, 'CORRECTNESS_r*.json'))
    ]
    newest = max(all_rounds)
    assert newest <= _WINDOW_ROUND <= newest + 1, (
        f'_WINDOW_ROUND={_WINDOW_ROUND} out of step with newest committed '
        f'correctness round {newest} — rotate the window and bump the pin'
    )


def test_changed_this_round_names_are_registered():
    from cyclebane_spark.queries import _CHANGED_THIS_ROUND, registry

    names = set(registry())
    unknown = [n for n in _CHANGED_THIS_ROUND if n not in names]
    assert not unknown, f'_CHANGED_THIS_ROUND names not registered: {unknown}'
