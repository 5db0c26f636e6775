"""Cross-device huge-pair mode (BASELINE config 5) vs single-device
oracles: tiled block-wavefront fill with chunked halo exchange, sharded
arrow storage, and the segment-relay exact traceback — all on the
8-virtual-device CPU mesh (SURVEY §4.3 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nw_tpu.ops import encode as enc
from nw_tpu.ops import traceback
from nw_tpu.ops.fill_scan import fill_diag


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def _case(rng, la, lb):
    top = jnp.asarray(enc.encode("".join(rng.choice(list("ACGT"), la))))
    side = jnp.asarray(enc.encode("".join(rng.choice(list("ACGT"), lb))))
    return top, side


@pytest.mark.parametrize(
    "la,lb,C,mkd",
    [
        (33, 41, 8, (2, 1, 1)),
        (57, 23, 16, (1, 1, 1)),
        (100, 90, 8, (2, 1, 1)),
        (5, 80, 8, (2, 1, 1)),    # walk crosses every device
        (80, 5, 8, (2, 1, 1)),    # single-device rows, long top
        (64, 64, 8, (0, 0, 0)),   # degenerate scoring (max tie density)
        (70, 30, 8, (3, -1, 2)),  # negative mismatch penalty
    ],
)
def test_sharded_huge_pair_vs_oracle(la, lb, C, mkd):
    from nw_tpu.parallel.huge_pair import (
        huge_pair_align_sharded,
        huge_pair_score_sharded,
    )

    mesh = _mesh(8)
    rng = np.random.default_rng(la * 1000 + lb)
    top, side = _case(rng, la, lb)
    ref = fill_diag(top, side, *mkd, with_scores=False)
    opsr, nr = traceback.traceback_greedy(
        ref["arrows"], la, lb, max_steps=la + lb
    )
    opsr, nr = np.asarray(opsr), int(nr)

    sc = huge_pair_score_sharded(top, side, *mkd, mesh, chunk=C)
    assert sc == int(ref["score"])
    r = huge_pair_align_sharded(top, side, *mkd, mesh, chunk=C)
    assert r.score == int(ref["score"])
    assert r.n == nr
    np.testing.assert_array_equal(r.ops, opsr[:nr])


@pytest.mark.parametrize("ndev", [2, 3, 5])
def test_sharded_huge_pair_mesh_sizes(ndev):
    from nw_tpu.parallel.huge_pair import huge_pair_align_sharded

    mesh = _mesh(ndev)
    rng = np.random.default_rng(ndev)
    top, side = _case(rng, 40, 50)
    ref = fill_diag(top, side, 2, 1, 1, with_scores=False)
    opsr, nr = traceback.traceback_greedy(ref["arrows"], 40, 50, max_steps=90)
    r = huge_pair_align_sharded(top, side, 2, 1, 1, mesh, chunk=8)
    assert r.score == int(ref["score"])
    assert r.n == int(nr)
    np.testing.assert_array_equal(r.ops, np.asarray(opsr)[: int(nr)])


def test_sharded_huge_pair_strings_roundtrip():
    """Stitched ops must materialize the reference's first alignment."""
    from nw_tpu.parallel.huge_pair import huge_pair_align_sharded

    mesh = _mesh(8)
    rng = np.random.default_rng(77)
    s1 = "".join(rng.choice(list("ACGT"), 60)).encode()
    s2 = "".join(rng.choice(list("ACGT"), 75)).encode()
    top = jnp.asarray(enc.encode(s1))
    side = jnp.asarray(enc.encode(s2))
    ref = fill_diag(top, side, 2, 1, 1, with_scores=False)
    opsr, nr = traceback.traceback_greedy(ref["arrows"], 60, 75, max_steps=135)
    want = traceback.ops_to_strings(np.asarray(opsr), int(nr), s1, s2)
    r = huge_pair_align_sharded(top, side, 2, 1, 1, mesh, chunk=16)
    got = traceback.ops_to_strings(r.ops, r.n, s1, s2)
    assert got == want


def test_align_huge_sharded_api():
    from nw_tpu.models.needleman_wunsch import NWAligner, align

    mesh = _mesh(8)
    rng = np.random.default_rng(5)
    s1 = "".join(rng.choice(list("ACGT"), 70))
    s2 = "".join(rng.choice(list("ACGT"), 85))
    ref = align(s1, s2, 2, 1, 1)
    want_X, want_Y = ref.best_alignment()
    r = NWAligner(match=2, mismatch=1, indel=1).align_huge_sharded(
        s1, s2, mesh, chunk=16
    )
    assert r.score == ref.score
    assert (r.X, r.Y) == (want_X, want_Y)


@pytest.mark.parametrize(
    "la,lb,C,mkd",
    [
        (33, 41, 8, (2, 1, 1)),
        (5, 80, 8, (2, 1, 1)),
        (64, 64, 8, (0, 0, 0)),
        (300, 280, 32, (3, -1, 2)),
    ],
)
def test_sharded_huge_pair_pallas_engine(la, lb, C, mkd):
    """The fold-chunk Pallas engine (per-device kernel-speed fills),
    interpret mode on the CPU mesh, vs the same oracles."""
    from nw_tpu.parallel.huge_pair import (
        huge_pair_align_sharded,
        huge_pair_score_sharded,
    )

    mesh = _mesh(8)
    rng = np.random.default_rng(la * 7 + lb)
    top, side = _case(rng, la, lb)
    ref = fill_diag(top, side, *mkd, with_scores=False)
    opsr, nr = traceback.traceback_greedy(
        ref["arrows"], la, lb, max_steps=la + lb
    )
    sc = huge_pair_score_sharded(
        top, side, *mkd, mesh, chunk=C, engine="pallas", interpret=True
    )
    assert sc == int(ref["score"])
    r = huge_pair_align_sharded(
        top, side, *mkd, mesh, chunk=C, engine="pallas", interpret=True
    )
    assert r.score == int(ref["score"])
    assert r.n == int(nr)
    np.testing.assert_array_equal(r.ops, np.asarray(opsr)[: int(nr)])
