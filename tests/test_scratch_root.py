"""Hardening of the per-user default scratch root (ADVICE r6 + r7):
the predictable /tmp name must never be silently shared with, or
redirected by, another local user."""

from __future__ import annotations

import os

import pytest

from mergers_acquisitions_predictions_spark.plans import handshake as H


def _patched_tmp(monkeypatch, tmp_path) -> str:
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    return os.path.join(
        str(tmp_path), f"mergers_acquisitions_spark_u{os.getuid()}"
    )


def test_default_scratch_rejects_symlink(monkeypatch, tmp_path):
    """ADVICE r7 (medium): an attacker pre-creating the predictable
    name as a SYMLINK to a directory the victim owns passes a
    follow-symlink uid check while every artifact write lands through
    the attacker-chosen link — _default_scratch must refuse."""
    root = _patched_tmp(monkeypatch, tmp_path)
    target = tmp_path / "attacker_chosen"
    target.mkdir()
    os.symlink(str(target), root)
    with pytest.raises(PermissionError, match="symlink"):
        H._default_scratch()


def test_default_scratch_rejects_non_directory(monkeypatch, tmp_path):
    root = _patched_tmp(monkeypatch, tmp_path)
    with open(root, "w") as f:
        f.write("not a dir")
    with pytest.raises(PermissionError, match="not a directory"):
        H._default_scratch()


def test_default_scratch_creates_private_dir(monkeypatch, tmp_path):
    root = _patched_tmp(monkeypatch, tmp_path)
    got = H._default_scratch()
    assert got == root
    st = os.lstat(root)
    assert (st.st_mode & 0o777) == 0o700
    assert st.st_uid == os.getuid()
    # idempotent on a healthy pre-existing dir
    assert H._default_scratch() == root
