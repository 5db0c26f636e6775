"""Property tests for the anti-diagonal fill (SURVEY.md §4.3 item 2)."""

import numpy as np
import pytest

from nw_tpu.ops.encode import encode, encode_pair
from nw_tpu.ops.fill_scan import fill_diag, fill_matrix


def naive_nw(s1: str, s2: str, m: int, k: int, d: int):
    """Cell-at-a-time reference DP, transcribing the reference scoring
    rules (needleman-wunsch.c:418-510, computation.c:94-120)."""
    A, B = len(s1), len(s2)
    H = np.zeros((B + 1, A + 1), np.int64)
    Ar = np.zeros((B + 1, A + 1), np.uint8)
    for i in range(1, A + 1):
        H[0, i] = -i * d
        Ar[0, i] = 2
    for j in range(1, B + 1):
        H[j, 0] = -j * d
        Ar[j, 0] = 4
    for j in range(1, B + 1):
        for i in range(1, A + 1):
            sub = m if s1[i - 1] == s2[j - 1] else -k
            cd, cu, cl = H[j - 1, i - 1] + sub, H[j - 1, i] - d, H[j, i - 1] - d
            s = max(cd, cu, cl)
            H[j, i] = s
            Ar[j, i] = (cd == s) | ((cl == s) << 1) | ((cu == s) << 2)
    return H, Ar


CASES = [
    ("GCATGCU", "GATTACA", 1, 1, 1),
    ("GT", "GT", 1, 1, 1),
    ("GT", "GA", 1, 1, 1),
    ("GAT", "GTA", 1, 1, 1),
    ("GT", "GA", 0, 0, 0),  # degenerate: everything ties
    ("ACGT", "ACGT", -2, -1, 3),  # negative match bonus
    ("", "ACG", 1, 1, 1),  # empty top string
    ("ACG", "", 1, 1, 1),  # empty side string
    ("AAAA", "AAAA", 2, 1, 0),  # zero gap penalty
]


@pytest.mark.parametrize("s1,s2,m,k,d", CASES)
def test_fill_matches_naive(s1, s2, m, k, d):
    He, Ae = naive_nw(s1, s2, m, k, d)
    Hs, As = fill_matrix(encode(s1), encode(s2), m, k, d)
    np.testing.assert_array_equal(He, Hs)
    np.testing.assert_array_equal(Ae, As)


def test_fill_random_fixed_shape():
    """Many random contents at ONE shape (single jit compile)."""
    rng = np.random.default_rng(7)
    for _ in range(25):
        s1 = "".join(rng.choice(list("ACGT"), 12))
        s2 = "".join(rng.choice(list("ACGT"), 10))
        m, k, d = (int(x) for x in rng.integers(-3, 4, 3))
        He, Ae = naive_nw(s1, s2, m, k, d)
        Hs, As = fill_matrix(encode(s1), encode(s2), m, k, d)
        np.testing.assert_array_equal(He, Hs)
        np.testing.assert_array_equal(Ae, As)


def test_padding_does_not_contaminate():
    """A padded fill agrees with an unpadded fill inside the true
    rectangle, and the captured true-corner score is right."""
    s1, s2, m, k, d = "GCATGCU", "GATTACA", 1, 2, 1
    top, side, l1, l2 = encode_pair(s1, s2, 16, 12)
    out = fill_diag(top, side, m, k, d, l1, l2, with_scores=True)
    He, Ae = naive_nw(s1, s2, m, k, d)
    from nw_tpu.ops.fill_scan import diag_to_matrix

    H = diag_to_matrix(np.asarray(out["scores"]), l1, l2)
    A = diag_to_matrix(np.asarray(out["arrows"]), l1, l2)
    np.testing.assert_array_equal(He[: l2 + 1, : l1 + 1], H)
    np.testing.assert_array_equal(Ae[: l2 + 1, : l1 + 1], A)
    assert int(out["score"]) == He[l2, l1]


def test_symmetry_swap():
    """score(A,B) == score(B,A); arrows swap LEFT<->UP and transpose."""
    s1, s2, m, k, d = "GATTACA", "GCATGCU", 1, 1, 1
    H1, A1 = fill_matrix(encode(s1), encode(s2), m, k, d)
    H2, A2 = fill_matrix(encode(s2), encode(s1), m, k, d)
    np.testing.assert_array_equal(H1, H2.T)
    swapped = (
        (A2 & 1) | ((A2 & 2) << 1) | ((A2 & 4) >> 1)
    )  # LEFT<->UP under transpose
    np.testing.assert_array_equal(A1, swapped.T)
