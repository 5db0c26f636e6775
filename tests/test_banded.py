"""Banded (row-tiled) Pallas fill vs the lax.scan oracle.

Runs in interpret mode on CPU; tiny band/chunk/unroll geometries force
the multi-band boundary handoff at test sizes (the compiled kernels are
swept on hardware by scripts/tpu_validate.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nw_tpu.ops import encode as enc
from nw_tpu.ops.fill_scan import fill_scores_batch

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _pairs(rng, n, lo, hi):
    return [
        (
            "".join(rng.choice(list("ACGTN"), int(rng.integers(lo, hi)))).encode(),
            "".join(rng.choice(list("ACGTN"), int(rng.integers(lo, hi)))).encode(),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "geometry,mkd,lo,hi",
    [
        ((8, 8, 4), (2, 1, 1), 1, 40),    # many tiny bands
        ((16, 8, 8), (1, 1, 1), 1, 40),   # RB > C (lag0 > 0)
        ((8, 16, 2), (2, 1, 1), 5, 60),   # C > RB
        ((24, 8, 8), (0, 0, 0), 1, 90),   # degenerate scoring
        ((32, 32, 16), (3, -1, 2), 1, 90),  # negative mismatch penalty
        ((96, 480, 24), (2, 1, 1), 1, 90),  # production geometry, 1 band
    ],
)
def test_banded_scores_vs_oracle(geometry, mkd, lo, hi):
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    RB, C, U = geometry
    rng = np.random.default_rng(hash(geometry) % 2**32)
    ps = _pairs(rng, 6, lo, hi)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = np.asarray(
        fill_scores_batch(tops, sides, *mkd, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, *mkd,
            interpret=True, band_rows=RB, chunk=C, unroll=U,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_banded_scores_degenerate_lengths():
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    ps = [(b"", b""), (b"ACGT", b""), (b"", b"ACGT"), (b"A", b"ACGTACGTACG")]
    tops, sides, l1, l2 = enc.encode_batch(ps, 8, 12)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            interpret=True, band_rows=8, chunk=8, unroll=2,
        )
    )
    np.testing.assert_array_equal(got, ref)


def banded_arrows_to_diag(words, A, Bs):
    """Band-major packed words int32[nbands, T4, RB, B] -> uint8[B, K, N]
    diagonal-major (test-only converter; cell (j, i) lives at band
    j//RB, local diag (i + j%RB), row j%RB, byte (i + j%RB) & 3)."""
    w = np.asarray(words)
    nbands, T4, RB, B = w.shape
    T = T4 * 4
    full = np.stack(
        [(w >> (8 * r)) & 0xFF for r in range(4)], axis=2
    ).reshape(nbands, T, RB, B)
    K, N = A + Bs + 1, Bs + 1
    out = np.zeros((B, K, N), np.uint8)
    kks = np.arange(K)
    for j in range(N):
        r, jj = divmod(j, RB)
        t = kks - r * RB
        valid = (t >= 0) & (t < T) & (kks >= j) & (kks - j <= A)
        out[:, valid, j] = full[r, t[valid], jj, :].T
    return out


@pytest.mark.parametrize("with_counts", [False, True])
@pytest.mark.parametrize(
    "geometry",
    [(8, 8, 4), (16, 8, 8), (8, 16, 4), (32, 32, 16)],
)
def test_banded_arrows_vs_oracle(geometry, with_counts):
    from nw_tpu.ops import pathcount
    from nw_tpu.ops.fill_pallas_banded import fill_arrows_banded_batch
    from nw_tpu.ops.fill_scan import fill_diag_batch

    RB, C, U = geometry
    rng = np.random.default_rng(hash(geometry) % 2**31 + with_counts)
    ps = _pairs(rng, 5, 1, 50)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = fill_diag_batch(tops, sides, 2, 1, 1, l1j, l2j)
    ref_arrows = np.asarray(ref["arrows"])
    ref_scores = np.asarray(ref["score"])

    out = fill_arrows_banded_batch(
        tops, sides, l1, l2, 2, 1, 1,
        interpret=True, band_rows=RB, chunk=C, unroll=U,
        with_counts=with_counts,
    )
    words, scores = out[0], out[1]
    np.testing.assert_array_equal(np.asarray(scores), ref_scores)
    if with_counts:
        ref_counts = np.asarray(
            jax.vmap(pathcount.count_paths)(ref["arrows"], l1j, l2j)
        )
        np.testing.assert_array_equal(np.asarray(out[2]), ref_counts)

    got = banded_arrows_to_diag(words, tops.shape[1], sides.shape[1])
    for b, (a, s2) in enumerate(ps):
        A1, B2 = len(a), len(s2)
        for j in range(B2 + 1):
            for kk in range(j, j + A1 + 1):
                if kk == 0:
                    continue  # cell (0,0) has no arrows (seeded)
                assert got[b, kk, j] == ref_arrows[b, kk, j], (b, kk, j)


def test_banded_scores_band_boundary_lengths():
    """Pairs whose side length sits exactly on band boundaries."""
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    rng = np.random.default_rng(7)
    RB = 8
    ps = []
    for L2 in (7, 8, 9, 15, 16, 17, 24):
        s1 = "".join(rng.choice(list("ACGT"), 20)).encode()
        s2 = "".join(rng.choice(list("ACGT"), L2)).encode()
        ps.append((s1, s2))
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            interpret=True, band_rows=RB, chunk=8, unroll=4,
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("engine", ["onepass", "twopass"])
@pytest.mark.parametrize("with_counts", [False, True])
@pytest.mark.parametrize(
    "geometry", [(8, 8, 4, 2), (16, 8, 8, 3), (8, 16, 4, 2), (32, 32, 16, 2)]
)
def test_banded_nw_traceback_vs_oracle(geometry, with_counts, engine, monkeypatch):
    """traceback_banded_batch vs the scan-oracle greedy walk: scores,
    ops, lengths, counts — through BOTH the one-pass (materialized
    2-bit words) and two-pass (checkpointed re-fill) engines."""
    from nw_tpu.ops import pathcount
    from nw_tpu.ops.banded_traceback import traceback_banded_batch
    from nw_tpu.ops.fill_scan import fill_diag_batch
    from nw_tpu.ops.traceback import traceback_greedy

    if engine == "onepass":
        monkeypatch.setenv("NW_TPU_ONEPASS_HBM", str(8 << 30))
    RB, C, U, S = geometry
    rng = np.random.default_rng(hash(geometry) % 2**31 + with_counts)
    ps = _pairs(rng, 6, 1, 60) + [(b"", b""), (b"ACGT", b""), (b"", b"ACG")]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = fill_diag_batch(tops, sides, 2, 1, 1, l1j, l2j)

    out = traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1,
        interpret=True, band_rows=RB, chunk=C, unroll=U, group_bands=S,
        with_counts=with_counts,
    )
    if with_counts:
        scores, counts, ops, n = out
        want_counts = np.array(
            jax.vmap(pathcount.count_paths)(ref["arrows"], l1j, l2j)
        )
        # 1x1 tables: the reference DFS emits nothing (count 0)
        want_counts[(l1 == 0) & (l2 == 0)] = 0
        got_counts = np.array(counts)
        got_counts[(l1 == 0) & (l2 == 0)] = 0
        np.testing.assert_array_equal(got_counts, want_counts)
    else:
        scores, ops, n = out
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(ref["score"]))
    for b in range(len(ps)):
        max_steps = int(l1[b] + l2[b]) or 1
        want_ops, want_n = traceback_greedy(
            ref["arrows"][b], int(l1[b]), int(l2[b]), max_steps=max_steps
        )
        assert int(n[b]) == int(want_n), b
        np.testing.assert_array_equal(
            np.asarray(ops[b][: int(n[b])]),
            np.asarray(want_ops[: int(want_n)]),
            err_msg=str(b),
        )


def test_pipelined_banded_walk_matches_single_chunk():
    """The dispatch-all/finalize-all multi-chunk path must concatenate
    to exactly what one big traceback_banded_batch call produces."""
    from nw_tpu.models.needleman_wunsch import _pipelined_banded_walk
    from nw_tpu.ops.banded_traceback import traceback_banded_batch

    rng = np.random.default_rng(55)
    norm = _pairs(rng, 10, 10, 60)
    bucket = lambda n: max(64, n)
    sc_l, ct_l, ops_l, n_l = _pipelined_banded_walk(
        norm, 2, 1, 1, chunk=4, count=True, bucket_for=bucket,
        interpret=True,
    )
    tops, sides, l1, l2 = enc.encode_batch(norm, 64, 64)
    want_sc, want_ct, want_ops, want_n = traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1, interpret=True, with_counts=True
    )
    np.testing.assert_array_equal(np.concatenate(sc_l), want_sc)
    np.testing.assert_array_equal(np.concatenate(ct_l), want_ct)
    np.testing.assert_array_equal(np.concatenate(n_l), want_n)
    got_ops = np.concatenate(ops_l)
    for b in range(len(norm)):
        np.testing.assert_array_equal(
            got_ops[b, : want_n[b]], want_ops[b, : want_n[b]]
        )


def test_greedy2_single_band_vs_oracle():
    """fill_greedy_banded_single (flat 2-bit layout) + traceback_greedy2
    vs the scan-oracle greedy walk."""
    from nw_tpu.ops.fill_pallas_banded import fill_greedy_banded_single
    from nw_tpu.ops.fill_scan import fill_diag_batch
    from nw_tpu.ops.traceback import traceback_greedy, traceback_greedy2_batch

    rng = np.random.default_rng(77)
    ps = _pairs(rng, 6, 1, 50) + [(b"", b""), (b"ACGT", b""), (b"", b"ACG")]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = fill_diag_batch(tops, sides, 2, 1, 1, l1j, l2j)

    words2, scores = fill_greedy_banded_single(
        tops, sides, l1, l2, 2, 1, 1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(ref["score"]))
    max_steps = tops.shape[1] + sides.shape[1]
    ops, n = traceback_greedy2_batch(words2, l1j, l2j, max_steps=max_steps)
    for b in range(len(ps)):
        want_ops, want_n = traceback_greedy(
            ref["arrows"][b], int(l1[b]), int(l2[b]), max_steps=max_steps
        )
        assert int(n[b]) == int(want_n), b
        np.testing.assert_array_equal(
            np.asarray(ops[b][: int(n[b])]),
            np.asarray(want_ops[: int(want_n)]),
            err_msg=str(b),
        )


@pytest.mark.parametrize("geometry", [(8, 8, 4), (16, 8, 8), (32, 32, 16)])
def test_banded_variants_vs_oracle(geometry):
    from nw_tpu.models.affine import affine_score
    from nw_tpu.models.smith_waterman import sw_fill_diag
    from nw_tpu.ops.variants_banded import (
        affine_scores_banded_batch,
        sw_scores_banded_batch,
    )

    RB, C, U = geometry
    rng = np.random.default_rng(hash(geometry) % 2**31)
    ps = _pairs(rng, 6, 1, 60) + [(b"", b""), (b"ACGT", b""), (b"", b"ACGT")]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    sw = np.asarray(
        sw_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            interpret=True, band_rows=RB, chunk=C, unroll=U,
        )
    )
    af = np.asarray(
        affine_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 3, 1,
            interpret=True, band_rows=RB, chunk=C, unroll=U,
        )
    )
    for b, (a, s2) in enumerate(ps):
        t = jnp.asarray(enc.encode(a))
        si = jnp.asarray(enc.encode(s2))
        assert sw[b] == int(
            sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
        ), b
        want_af = 0 if not (a or s2) else int(affine_score(t, si, 2, 1, 3, 1))
        assert af[b] == want_af, b


@pytest.mark.parametrize("engine", ["onepass", "twopass"])
@pytest.mark.parametrize("geometry", [(8, 8, 4, 2), (16, 16, 8, 3), (8, 24, 8, 2)])
def test_banded_sw_traceback_vs_oracle(geometry, engine, monkeypatch):
    from nw_tpu.models.smith_waterman import sw_align
    from nw_tpu.ops.traceback import ops_to_strings
    from nw_tpu.ops.variants_banded import sw_traceback_banded_batch

    if engine == "onepass":
        monkeypatch.setenv("NW_TPU_ONEPASS_HBM", str(8 << 30))
    RB, C, U, S = geometry
    rng = np.random.default_rng(hash(geometry) % 2**31)
    ps = _pairs(rng, 6, 1, 60) + [(b"AAAA", b"TTTT"), (b"", b"ACG"), (b"ACG", b"")]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    best, jst, ist, j_end, i_end, ops, n = sw_traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1,
        interpret=True, band_rows=RB, chunk=C, unroll=U, group_bands=S,
    )
    for b, (a, s2) in enumerate(ps):
        want_best, want_X, want_Y, want_start = sw_align(a, s2, 2, 1, 1)
        X, Y = ops_to_strings(
            ops[b], int(n[b]), a[: int(ist[b])], s2[: int(jst[b])]
        )
        assert int(best[b]) == want_best, b
        assert (X, Y) == (want_X, want_Y), b
        assert (int(j_end[b]), int(i_end[b])) == want_start, b


@pytest.mark.parametrize("engine", ["onepass", "twopass"])
@pytest.mark.parametrize("geometry", [(8, 8, 4, 2), (16, 16, 8, 3)])
def test_banded_affine_traceback_vs_oracle(geometry, engine, monkeypatch):
    from nw_tpu.models.affine import affine_align
    from nw_tpu.ops.traceback import ops_to_strings
    from nw_tpu.ops.variants_banded import affine_traceback_banded_batch

    if engine == "onepass":
        monkeypatch.setenv("NW_TPU_ONEPASS_HBM", str(8 << 30))
    RB, C, U, S = geometry
    rng = np.random.default_rng(hash(geometry) % 2**31 + 1)
    ps = _pairs(rng, 6, 1, 50) + [(b"ACGT", b""), (b"", b"ACGT")]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    score, ops, n = affine_traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 3, 1,
        interpret=True, band_rows=RB, chunk=C, unroll=U, group_bands=S,
    )
    for b, (a, s2) in enumerate(ps):
        want = affine_align(a, s2, 2, 1, 3, 1)
        X, Y = ops_to_strings(ops[b], int(n[b]), a, s2)
        assert int(score[b]) == want[0], b
        assert (X, Y) == (want[1], want[2]), b
