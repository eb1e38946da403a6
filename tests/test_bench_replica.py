"""Invariants of bench.py's scale-replica perturbation families.

The replica builder's whole purpose is destroying cross-copy content
equality while preserving workload shape. That guarantee is easy to
break silently: composing two Caesar shifts has only 26 states, so a
second decade of shifts gave ~4 byte-identical copies of every document
per composed rotation — the duplicate-pair pathology came back at sf10
and masqueraded as super-linear operator behavior (caught in r06).
These tests pin the algebra so the next edit to the builder can't
reintroduce it.
"""

from __future__ import annotations

import string

import numpy as np

# the builder's constants, restated: decade-1 letter shifts and
# decade-2 affine multipliers
SHIFTS = [0] + [j % 25 + 1 for j in range(1, 10)]
MULTS = [1] + [[3, 5, 7, 9, 11, 15, 17, 19, 21][(i - 1) % 9]
               for i in range(1, 10)]
EMB_ROTS = [0] + [j % 63 + 1 for j in range(1, 10)]
EMB_MASKS = list(range(10))


def composed_letter_map(i: int, j: int) -> tuple:
    """The end-to-end permutation a document in sf10 copy (i, j) saw:
    decade-1 shift r_j, then decade-2 multiplier k_i — x -> k(x + r)."""
    k, r = MULTS[i], SHIFTS[j]
    return tuple((k * (x + r)) % 26 for x in range(26))


def test_second_decade_letter_maps_are_pairwise_distinct():
    maps = {}
    for i in range(10):
        for j in range(10):
            m = composed_letter_map(i, j)
            assert m not in maps, (
                f"copies {maps[m]} and {(i, j)} compose to the SAME "
                "letter permutation — byte-identical documents across "
                "sf10 copies (the r06 duplicate-pathology bug)"
            )
            maps[m] = (i, j)
    assert len(maps) == 100
    # every map is a permutation (multipliers are coprime to 26)
    for m in maps:
        assert sorted(m) == list(range(26))


def test_two_decades_of_shifts_would_collide():
    # the property the r06 fix exists for: shift∘shift has ≤26 states
    composed = {
        (SHIFTS[i] + SHIFTS[j]) % 26 for i in range(10) for j in range(10)
    }
    assert len(composed) < 100  # 100 copies CANNOT all be distinct


def test_second_decade_embedding_transforms_decorrelate():
    """Max pairwise |cosine| among the 100 transformed versions of one
    vector stays far below dedup thresholds: rotations decorrelate a
    random vector, Walsh masks flip exactly half the dims between any
    two distinct masks, and mixed pairs are random-like."""
    rng = np.random.RandomState(11)
    v = rng.randn(64)
    v /= np.linalg.norm(v)

    def transform(i, j):
        out = np.roll(v, -EMB_ROTS[j])  # decade-1 cyclic rotation
        d = np.arange(64)
        flip = np.array(
            [bin(int(x) & EMB_MASKS[i]).count("1") % 2 for x in d]
        )
        return out * np.where(flip == 1, -1.0, 1.0)

    mats = [transform(i, j) for i in range(10) for j in range(10)]
    worst = 0.0
    for a in range(100):
        for b in range(a + 1, 100):
            worst = max(worst, abs(float(mats[a] @ mats[b])))
    assert worst < 0.7, worst
    # Walsh property exactly: two distinct masks differ on 32 of 64 dims
    for m1 in range(10):
        for m2 in range(m1 + 1, 10):
            diff = sum(
                bin(d & m1).count("1") % 2 != bin(d & m2).count("1") % 2
                for d in range(64)
            )
            assert diff == 32, (m1, m2, diff)


def test_builder_source_uses_the_pinned_constants():
    """The algebra above must describe the ACTUAL builder: if bench.py's
    perturbation constants drift, this test forces the invariants to be
    re-derived rather than silently diverging."""
    import bench

    src = open(bench.__file__).read()
    assert "[3, 5, 7, 9, 11, 15, 17, 19, 21][(i - 1) % 9]" in src
    assert "i % 25 + 1" in src
    assert "i % 63 + 1" in src
    assert "bit_count(CAST(d AS INT) & {i})" in src
    lo = string.ascii_lowercase
    # multiplier maps in the builder are x -> k*x; composed with the
    # decade-1 shift they realize the affine family tested above
    assert 'lo[(k * x) % 26]' in src
