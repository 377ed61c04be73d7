"""Unit tests for the driver-window rotation in __spark_entry__.

The external harness samples the first ~50 entries of ``queries()``.
Rounds 1-9 rotated never-verified names first, which CLOSED the
ledger at 377/377; since round 10 the rotation orders by
verification AGE (least-recently-driver-verified first) so each
round's window re-proves the stalest rows on the current tree.
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


def test_rotation_orders_by_verification_age(monkeypatch):
    reg = sorted(entry._REGISTRY)
    # pretend: first third verified in round 1, second third in round
    # 5, the rest never verified
    third = len(reg) // 3
    latest = {n: 1 for n in reg[:third]}
    latest.update({n: 5 for n in reg[third : 2 * third]})
    monkeypatch.setattr(entry, "_verified_round", lambda: latest)
    names = entry._rotated()
    # never-verified first (alpha), then round-1 vintage, then round-5
    assert names[: len(reg) - 2 * third] == reg[2 * third :]
    assert names[len(reg) - 2 * third : len(reg) - third] == reg[:third]
    assert names[len(reg) - third :] == reg[third : 2 * third]


def test_stalest_rows_lead_on_the_real_ledger():
    """Against the actual CORRECTNESS ledger: the window head must be
    at least as stale as anything behind it (monotone age)."""
    latest = entry._verified_round()
    names = entry._rotated()
    ages = [latest.get(n, -1) for n in names]
    assert ages == sorted(ages)


def test_every_query_has_an_oracle():
    oracles = entry.oracle_sql()
    assert set(oracles) == set(entry._REGISTRY)
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
