#!/usr/bin/env python
"""Recompute the driver-window `_PRIORITY` for the CURRENT
`_CHANGED_THIS_ROUND` / `_WINDOW_ROUND` in cyclebane_spark/queries/__init__.py
and print it as a ready-to-paste tuple body.

The ordering restates the rotation contract (tests/test_priority_window.py):
tier 1 driver-red, tier 2 changed-since-green, tier 3 never-seen, tier 4
stalest-green backfill — window membership sorted stalest-first by
(newest_green_round, name). Run after every addition to _CHANGED_THIS_ROUND;
paste the output over the _PRIORITY body and re-run the contract test.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WINDOW = 50


def main() -> None:
    from cyclebane_spark.queries import (
        _CHANGED_THIS_ROUND,
        _WINDOW_ROUND,
        registry,
    )

    files = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, 'CORRECTNESS_r*.json'))
            if int(re.search(r'_r0*(\d+)', p).group(1)) < _WINDOW_ROUND
        ),
        key=lambda p: int(re.search(r'_r0*(\d+)', p).group(1)),
    )
    newest_green: dict[str, int] = {}
    seen: set[str] = set()
    reds: set[str] = set()
    for path in files:
        rnd = int(re.search(r'_r0*(\d+)', path).group(1))
        data = json.load(open(path))
        seen.update(data)
        reds = {
            n
            for n, rec in data.items()
            if not (
                rec.get('err') is None
                and rec.get('rows_match')
                and rec.get('schema_match')
                and rec.get('hash_match') is not False
            )
        }
        for name, rec in data.items():
            if (
                rec.get('err') is None
                and rec.get('rows_match')
                and rec.get('schema_match')
                and rec.get('hash_match') is not False
            ):
                newest_green[name] = max(newest_green.get(name, 0), rnd)
    names = set(registry())
    for n in seen:
        newest_green.setdefault(n, 0)

    required = (reds & names) | set(_CHANGED_THIS_ROUND) | (names - seen)
    stale_key = lambda n: (newest_green.get(n, 0), n)  # noqa: E731
    req_sorted = sorted(required, key=stale_key)
    if len(required) >= WINDOW:
        window = req_sorted[:WINDOW]
    else:
        backfill = sorted(names - required, key=stale_key)
        window = req_sorted + backfill[: WINDOW - len(required)]

    print(f'# window for round {_WINDOW_ROUND}: {len(required)} required '
          f'({len(reds & names)} red), {WINDOW - min(WINDOW, len(required))} backfill')
    cur_round = None
    for n in window:
        r = newest_green.get(n, 0)
        if r != cur_round:
            tag = 'never-seen' if n in (names - seen) else f'newest green r{r}'
            req = '' if n in required else ' (backfill)'
            print(f'    # {tag}{req}')
            cur_round = r
        print(f'    {n!r},')


if __name__ == '__main__':
    main()
