"""Property tests for the clamped-affine scan algebra used by
clamped_balance_parallel_scan (pure Python — no Spark session).

The parallel formulation rests on two algebraic facts:
1. x -> max(lo, min(hi, x + s)) maps are closed under composition.
2. Composition is associative, so any banding of the step sequence
   composes to the same total map.
Hypothesis drives both with arbitrary integer delta sequences and
band splits.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

CAP = 100_000
BIG = 1 << 62

IDENT = (0, -BIG, BIG)


def step(d: int) -> tuple[int, int, int]:
    """The clamp step x -> max(0, min(CAP, x + d)) as (s, lo, hi)."""
    return (d, 0, CAP)


def compose(f, g):
    """g after f — same formula as the Spark fold."""
    fs, flo, fhi = f
    gs, glo, ghi = g
    return (
        fs + gs,
        max(glo, min(ghi, flo + gs)),
        min(ghi, fhi + gs),
    )


def apply_map(f, x: int) -> int:
    s, lo, hi = f
    return max(lo, min(hi, x + s))


def sequential(deltas: list[int]) -> int:
    bal = 0
    for d in deltas:
        bal = max(0, min(CAP, bal + d))
    return bal


@given(st.lists(st.integers(-CAP * 2, CAP * 2), max_size=60))
@settings(max_examples=300, deadline=None)
def test_composed_map_equals_sequential_fold(deltas):
    f = IDENT
    for d in deltas:
        f = compose(f, step(d))
    assert apply_map(f, 0) == sequential(deltas)


@given(
    st.lists(st.integers(-CAP * 2, CAP * 2), min_size=1, max_size=60),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_banded_composition_is_split_invariant(deltas, data):
    """Composing per-band then across bands gives the same map for
    ANY banding — the property that lets bands run in parallel."""
    cut = data.draw(
        st.lists(
            st.integers(1, len(deltas)), max_size=4, unique=True
        ).map(sorted)
    )
    bounds = [0] + cut + [len(deltas)]
    banded = IDENT
    for a, b in zip(bounds, bounds[1:]):
        band = IDENT
        for d in deltas[a:b]:
            band = compose(band, step(d))
        banded = compose(banded, band)
    flat = IDENT
    for d in deltas:
        flat = compose(flat, step(d))
    assert apply_map(banded, 0) == apply_map(flat, 0)
    assert banded == flat
