"""Property test: A13 closed-form moves-to-balance equals the reference's
greedy loop (distributor/DistributeTableWeight.java:26-47 /
TableDistributor.java:72-90), which moves one region from the fullest to
the emptiest server until spread <= 1."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def greedy_moves(counts: list[int]) -> int:
    """Independent port of the reference loop: while max-min > 1, move
    one region from an argmax server to an argmin server."""
    c = list(counts)
    moves = 0
    while max(c) - min(c) > 1:
        c[c.index(max(c))] -= 1
        c[c.index(min(c))] += 1
        moves += 1
    return moves


def closed_form_moves(counts: list[int]) -> int:
    """The implementation used by distribution_weight: total surplus above
    the balanced target (ceil(avg) for the r=total%S fullest servers,
    floor(avg) for the rest)."""
    total, s = sum(counts), len(counts)
    q, r = divmod(total, s)
    ranked = sorted(counts, reverse=True)
    moves = 0
    for i, n in enumerate(ranked):
        target = q + (1 if i < r else 0)
        if n > target:
            moves += n - target
    return moves


@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40))
@settings(max_examples=500, deadline=None)
def test_closed_form_equals_greedy(counts):
    assert closed_form_moves(counts) == greedy_moves(counts)


def test_known_cases():
    assert closed_form_moves([5, 0, 0, 0, 0]) == 4
    assert closed_form_moves([2, 2, 2]) == 0
    assert closed_form_moves([3, 1]) == 1
    assert closed_form_moves([0]) == 0
