"""Session-factory gates: the tmpfs scratch gate must honor the opt-out
and the free-space floor (r2 advisor: never route shuffle spill into a
near-full RAM-backed mount)."""

import os

from graphanalytics_spark import session


def test_tmpfs_gate_opt_out(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TMPFS", "0")
    assert session.tmpfs_dir_if_roomy() is None


def test_tmpfs_gate_free_space_floor(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TMPFS", raising=False)
    # an absurd floor makes any real mount "too full" → disk fallback
    monkeypatch.setattr(session, "TMPFS_MIN_FREE_BYTES", 1 << 60)
    assert session.tmpfs_dir_if_roomy() is None


def test_tmpfs_gate_roomy_mount(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TMPFS", raising=False)
    monkeypatch.setattr(session, "TMPFS_MIN_FREE_BYTES", 1)
    if os.path.isdir("/dev/shm"):
        got = session.tmpfs_dir_if_roomy("x")
        assert got == "/dev/shm/x"
