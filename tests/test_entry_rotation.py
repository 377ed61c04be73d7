"""Unit tests for the driver-window rotation in __spark_entry__.

The external harness samples the first ~50 entries of ``queries()``;
the rotation must therefore (a) cover every registry name exactly
once, (b) put never-driver-verified names before verified ones, and
(c) honor the priority head for the reference's signature semantics.
No Spark session needed.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_rotation_is_a_permutation_of_the_registry():
    names = entry._rotated()
    assert sorted(names) == sorted(entry._REGISTRY)
    assert len(names) == len(set(names))


def test_rotation_puts_unverified_before_verified(monkeypatch):
    reg = sorted(entry._REGISTRY)
    seen = set(reg[::2])  # pretend every other name is verified
    monkeypatch.setattr(entry, "_driver_verified", lambda: seen)
    names = entry._rotated()
    first_seen_idx = min(names.index(n) for n in seen)
    last_unseen_idx = max(
        names.index(n) for n in names if n not in seen
    )
    assert last_unseen_idx < first_seen_idx


def test_priority_head_leads_when_unverified(monkeypatch):
    monkeypatch.setattr(entry, "_driver_verified", lambda: set())
    names = entry._rotated()
    head = [n for n in entry._PRIORITY if n in entry._REGISTRY]
    assert names[: len(head)] == head


def test_every_query_has_an_oracle():
    oracles = entry.oracle_sql()
    assert set(oracles) == set(entry._REGISTRY)
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
