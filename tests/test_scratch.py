"""The per-user scratch-dir helper's safety contract (cyclebane_spark.scratch)."""

import os
import stat

from cyclebane_spark.scratch import _verified_parent, scratch_dir


def test_scratch_parent_is_private_and_owned():
    parent = _verified_parent()
    st = os.lstat(parent)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert stat.S_IMODE(st.st_mode) == 0o700
    assert os.path.basename(parent) == f'cyclebane_spark_u{os.getuid()}'


def test_scratch_dir_is_deterministic_wipes_and_respects_create():
    d1 = scratch_dir('cb_test_scr', 'some/key')
    d2 = scratch_dir('cb_test_scr', 'some/key')
    assert d1 == d2 and os.path.isdir(d1)
    assert d1.startswith(_verified_parent() + os.sep)
    assert scratch_dir('cb_test_scr', 'other/key') != d1

    marker = os.path.join(d1, 'stale')
    open(marker, 'w').close()
    scratch_dir('cb_test_scr', 'some/key', wipe=True)
    assert os.path.isdir(d1) and not os.path.exists(marker)

    d3 = scratch_dir('cb_test_scr', 'some/key', wipe=True, create=False)
    assert d3 == d1 and not os.path.exists(d1)


def test_scratch_parent_retightens_loose_mode():
    parent = _verified_parent()
    os.chmod(parent, 0o755)
    _verified_parent()
    assert stat.S_IMODE(os.lstat(parent).st_mode) == 0o700
