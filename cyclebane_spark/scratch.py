"""Per-user scratch directories for deterministic stream/sink state.

Several queries keep DETERMINISTIC scratch state under the system temp dir
(stream landing dirs, CDC snapshots, materialized-view partials) so that
repeated gate/bench runs reuse one path instead of leaking a fresh mkdtemp
per invocation. A bare ``/tmp/<predictable-name>`` is hijackable on a
multi-user host: another user can pre-create the directory (names are
guessable — they key on public md5 inputs) and either feed rows into a
stream source or swap a snapshot between write and read-back.

Every such path therefore lives under ONE per-uid parent that is (a)
created 0700, (b) re-verified on every use to be a real directory owned by
the current uid (a pre-created decoy raises loudly instead of being
adopted), and (c) re-tightened to 0700 in case an older run left it wider.
Inside that parent, predictable names are safe: no other user can traverse
into it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import stat
import tempfile


def _verified_parent() -> str:
    parent = os.path.join(
        tempfile.gettempdir(), f'cyclebane_spark_u{os.getuid()}'
    )
    os.makedirs(parent, mode=0o700, exist_ok=True)
    st = os.lstat(parent)
    if not stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
        raise RuntimeError(
            f'scratch parent {parent!r} is not a directory owned by uid '
            f'{os.getuid()} — refusing to use it (pre-created by another '
            'user?)'
        )
    os.chmod(parent, 0o700)  # re-tighten if an older run left it wider
    return parent


def scratch_dir(
    prefix: str, key: str, wipe: bool = False, create: bool = True
) -> str:
    """Deterministic per-(user, prefix, key) scratch path under the
    verified per-uid parent. ``wipe`` clears any prior run's contents
    (the rerun-reuse idiom of the CDC sinks); ``create=False`` returns the
    path without creating the leaf (for writers like ``df.write.parquet``
    that insist on creating the target themselves)."""
    d = os.path.join(
        _verified_parent(),
        f'{prefix}_{hashlib.md5(key.encode()).hexdigest()[:12]}',
    )
    if wipe:
        shutil.rmtree(d, ignore_errors=True)
    if create:
        os.makedirs(d, exist_ok=True)
    return d
