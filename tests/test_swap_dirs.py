"""Unit pins for sources.catalog.swap_dirs — the guarded two-rename
directory swap every index compact commits through.

Hadoop FileSystem.rename reports failure by RETURNING false, not by
raising; the self-review-r12 finding was that an unchecked failed
second rename followed by the old-copy delete destroys the only
surviving copy of the data. Three compacts (pq/sq/bq) had
reimplemented the swap WITHOUT the guard, and the four inline guards
never checked the restore rename's own return ("original restored"
could lie). These tests pin the consolidated helper with a fake fs —
no Spark, no JVM.
"""

import pytest

from data_pengadaan_agent_spark.sources.catalog import swap_dirs


class FakeFS:
    """Directory-set semantics of Hadoop rename/delete: rename fails
    (returns False) when src is absent or dst exists, or when the
    (src, dst) pair is in the forced-failure set."""

    def __init__(self, dirs, fail=()):
        self.dirs = set(dirs)
        self.fail = set(fail)
        self.calls = []

    def rename(self, src, dst):
        self.calls.append(("rename", src, dst))
        if (src, dst) in self.fail or src not in self.dirs or dst in self.dirs:
            return False
        self.dirs.remove(src)
        self.dirs.add(dst)
        return True

    def delete(self, p, recursive=True):
        self.calls.append(("delete", p))
        return self.dirs.discard(p) is None and p is not None

    def exists(self, p):
        return p in self.dirs


IDENT = str  # jvm_path stand-in: paths are plain strings


def test_success_path_swaps_and_deletes_old():
    fs = FakeFS({"live", "tmp"})
    swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    assert fs.dirs == {"live"}  # tmp promoted, old removed
    assert ("delete", "old") in fs.calls


def test_first_rename_failure_leaves_live_untouched():
    fs = FakeFS({"live", "tmp"}, fail={("live", "old")})
    with pytest.raises(OSError, match="live data untouched"):
        swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    assert "live" in fs.dirs and "tmp" in fs.dirs
    # the old-copy delete must never have run
    assert ("delete", "old") not in fs.calls


def test_second_rename_failure_restores_original():
    fs = FakeFS({"live", "tmp"}, fail={("tmp", "live")})
    with pytest.raises(OSError, match="original restored"):
        swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    # live is the ORIGINAL data (restored from old), never deleted
    assert "live" in fs.dirs
    assert "old" not in fs.dirs
    assert ("delete", "old") not in fs.calls


def test_double_failure_preserves_data_at_old_and_says_so():
    fs = FakeFS(
        {"live", "tmp"}, fail={("tmp", "live"), ("old", "live")}
    )
    with pytest.raises(OSError, match="preserved at old"):
        swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    # the data survives at old; nothing deleted it
    assert "old" in fs.dirs
    assert ("delete", "old") not in fs.calls


def test_leftover_old_from_completed_swap_is_swept():
    """ADVICE r13: a crash after the second rename but before
    delete(old) leaves old alongside the (new) live copy; Hadoop
    rename returns false when dst exists, so without the up-front
    sweep every later swap wedges on its FIRST rename."""
    fs = FakeFS({"live", "tmp", "old"})
    swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    assert fs.dirs == {"live"}  # swap completed, not wedged


def test_leftover_old_without_live_is_never_swept():
    """The double-failure abort leaves the ONLY copy at old and live
    absent — a retry must not delete it; it fails on the missing
    source instead."""
    fs = FakeFS({"tmp", "old"})
    with pytest.raises(OSError, match="live data untouched"):
        swap_dirs(fs, IDENT, "tmp", "live", "old", "t")
    assert "old" in fs.dirs
    assert ("delete", "old") not in fs.calls


def test_label_reaches_every_message():
    fs = FakeFS({"live", "tmp"}, fail={("live", "old")})
    with pytest.raises(OSError, match="compact_ivfpq_table"):
        swap_dirs(fs, IDENT, "tmp", "live", "old", "compact_ivfpq_table")
