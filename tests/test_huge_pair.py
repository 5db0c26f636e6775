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


def test_auto_chunk_efficiency():
    """Chunk auto-pick keeps the phase pipeline >= 85% efficient at
    production scale and stays correct on a real (tiny) mesh run
    (VERDICT r2 item 8)."""
    from nw_tpu.parallel.huge_pair import (
        auto_chunk,
        huge_pair_align_sharded,
        pipeline_efficiency,
    )

    for nseq in (2, 4, 8):
        for L in (30_000, 100_000, 400_000):
            C = auto_chunk(L, L, nseq, "pallas")
            eff = pipeline_efficiency(L, L, nseq, C, "pallas")
            assert eff >= 0.85, (nseq, L, C, eff)
    # smaller chunks only help: the efficiency model is monotone
    assert pipeline_efficiency(100_000, 100_000, 8, 128, "pallas") >= (
        pipeline_efficiency(100_000, 100_000, 8, 2048, "pallas")
    )

    # chunk=None (auto) drives a real mesh run to the oracle answer
    mesh = _mesh(4)
    rng = np.random.default_rng(123)
    top, side = _case(rng, 60, 70)
    ref = fill_diag(top, side, 2, 1, 1, with_scores=False)
    opsr, nr = traceback.traceback_greedy(ref["arrows"], 60, 70, max_steps=130)
    r = huge_pair_align_sharded(top, side, 2, 1, 1, mesh)
    assert r.score == int(ref["score"])
    assert r.n == int(nr)
    np.testing.assert_array_equal(r.ops, np.asarray(opsr)[: int(nr)])


@pytest.mark.parametrize("engine", ["scan", "pallas", "pallasb"])
def test_resumable_huge_pair_kill_and_resume(tmp_path, engine):
    """Config-5 checkpoint/resume (VERDICT r2 item 6): the tiled fill
    persists its per-device phase carry + arrow planes each span; a
    killed run resumes and produces the identical score/ops as the
    uninterrupted sharded engine."""
    from nw_tpu.parallel.huge_pair import huge_pair_align_sharded
    from nw_tpu.runtime.checkpoint import ResumableHugePair

    mesh = _mesh(4)
    rng = np.random.default_rng(99 + len(engine))
    top, side = _case(rng, 40, 50)
    kw = dict(
        # pallasb walk words pack 16 diagonals per chunk-word quantum
        chunk=16 if engine == "pallasb" else 8,
        engine=engine, interpret=engine != "scan",
    )
    want = huge_pair_align_sharded(top, side, 2, 1, 1, mesh, **kw)

    rdir = tmp_path / f"huge-{engine}"
    runner = ResumableHugePair(str(rdir), span=3)
    with pytest.raises(KeyboardInterrupt):
        runner.run(
            top, side, 2, 1, 1, mesh, _abort_after_spans=2, **kw
        )
    assert (rdir / "huge_state.npz").exists()
    got = ResumableHugePair(str(rdir), span=3).run(
        top, side, 2, 1, 1, mesh, **kw
    )
    assert got.score == want.score
    assert got.n == want.n
    np.testing.assert_array_equal(got.ops, want.ops)

    # uninterrupted run through the runner matches too
    got2 = ResumableHugePair(str(tmp_path / f"h0-{engine}"), span=4).run(
        top, side, 2, 1, 1, mesh, **kw
    )
    assert (got2.score, got2.n) == (want.score, want.n)

    # wrong-params resume is refused
    with pytest.raises(ValueError):
        ResumableHugePair(str(rdir), span=3).run(
            top, side, 3, 1, 1, mesh, **kw
        )


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


@pytest.mark.parametrize(
    "nseq,la,lb,C,mkd,fb",
    [
        (8, 33, 41, 8, (2, 1, 1), None),
        (8, 5, 80, 8, (2, 1, 1), None),
        (8, 64, 64, 8, (0, 0, 0), None),   # max tie density
        (8, 300, 280, 32, (3, -1, 2), None),
        (2, 257, 511, 16, (2, 1, 1), None),
        # forced small FB => multi-block grids (nb > 1): the edge
        # stream, ch relay, activity windows, and corner-phase loop
        # variants all cross block boundaries
        (1, 120, 999, 16, (3, -1, 2), 1),
        (2, 150, 900, 24, (2, 1, 1), 2),
        (8, 80, 2100, 16, (2, 1, 1), 1),
    ],
)
def test_sharded_huge_pair_pallasb_engine(monkeypatch, nseq, la, lb, C, mkd, fb):
    """The register-blocked fold-chunk engine (``pallasb``, the TPU
    default for score-only config-5 fills), interpret mode on CPU
    meshes, vs the scan-oracle score.  Forced-FB rows shrink the block
    height so small shapes exercise multi-block grids; each forced row
    uses a distinct (shape, chunk) so the jit cache cannot serve an
    entry traced under a different FB."""
    import nw_tpu.parallel.huge_pair as hp

    mesh = _mesh(nseq)
    if fb is not None:
        monkeypatch.setattr(hp, "_pick_fb", lambda B, n: fb)
    rng = np.random.default_rng(la * 7 + lb + nseq)
    top, side = _case(rng, la, lb)
    ref = fill_diag(top, side, *mkd, with_scores=False)
    sc = hp.huge_pair_score_sharded(
        top, side, *mkd, mesh, chunk=C, engine="pallasb", interpret=True
    )
    assert sc == int(ref["score"])


@pytest.mark.parametrize(
    "nseq,la,lb,C,mkd,fb",
    [
        (8, 33, 41, 16, (2, 1, 1), None),
        (8, 5, 80, 16, (2, 1, 1), None),
        (8, 64, 64, 16, (0, 0, 0), None),  # max tie density
        (2, 300, 280, 32, (3, -1, 2), None),
        # forced small FB => multi-block grids (nb > 1): walk words
        # cross block boundaries and the reader's sublane-fastest
        # fold mapping is exercised across blocks
        (1, 120, 999, 16, (3, -1, 2), 1),
        (2, 150, 900, 48, (2, 1, 1), 2),
    ],
)
def test_sharded_huge_pair_pallasb_walk(
    monkeypatch, nseq, la, lb, C, mkd, fb
):
    """The register-blocked engine's 2-bit greedy walk words drive the
    segment-relay walk to the exact scan-oracle alignment (score, ops,
    length) — incl. all-tie pairs (the 2-bit codes collapse the tie
    masks by the same diag > left > up priority the relay walk applies
    to 3-bit masks)."""
    import nw_tpu.parallel.huge_pair as hp

    if fb is not None:
        monkeypatch.setattr(hp, "_pick_fb", lambda B, n: fb)
    mesh = _mesh(nseq)
    rng = np.random.default_rng(la * 11 + lb + nseq)
    top, side = _case(rng, la, lb)
    ref = fill_diag(top, side, *mkd, with_scores=False)
    opsr, nr = traceback.traceback_greedy(
        ref["arrows"], la, lb, max_steps=la + lb
    )
    r = hp.huge_pair_align_sharded(
        top, side, *mkd, mesh, chunk=C, engine="pallasb", interpret=True
    )
    assert r.score == int(ref["score"])
    assert r.n == int(nr)
    np.testing.assert_array_equal(r.ops, np.asarray(opsr)[: int(nr)])


def test_pallasb_chunk_and_fb_contracts():
    """auto_chunk returns 16-multiples for pallasb (unroll + edge-slab
    quanta, and the walk word quantum); the builder rejects
    non-8-multiple chunks; traceback requires a 16-multiple chunk
    (16 packed codes per walk word)."""
    from nw_tpu.parallel.huge_pair import (
        _build_fold_chunk_call_blocked,
        _huge_pair_device,
        auto_chunk,
    )

    for nseq in (1, 2, 8):
        for L in (100, 5_000, 100_000):
            assert auto_chunk(L, L, nseq, "pallasb") % 16 == 0
            assert (
                auto_chunk(L, L, nseq, "pallasb", traceback=True) % 16
                == 0
            )
    # the walk-word out block must fit VMEM at any FB
    assert auto_chunk(100_000, 100_000, 1, "pallasb", traceback=True) <= 1024
    with pytest.raises(ValueError):
        _build_fold_chunk_call_blocked(8, 1, 12, True)
    with pytest.raises(ValueError):
        _build_fold_chunk_call_blocked(16, 1, 24, True, traceback=True)
    mesh = _mesh(1)
    with pytest.raises(ValueError):
        _huge_pair_device(
            jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32),
            m=1, k=1, d=1, mesh=mesh, axis="seq", chunk=8,
            traceback=True, engine="pallasb", interpret=True,
        )


def test_resumable_huge_pair_pallasb_score_only(tmp_path):
    """Score-only config-5 resume rides the register-blocked engine
    (the TPU default for fills): kill mid-fill, resume, identical
    score to the uninterrupted run."""
    from nw_tpu.parallel.huge_pair import huge_pair_score_sharded
    from nw_tpu.runtime.checkpoint import ResumableHugePair

    mesh = _mesh(4)
    rng = np.random.default_rng(7)
    top, side = _case(rng, 40, 50)
    kw = dict(chunk=8, engine="pallasb", interpret=True)
    want = huge_pair_score_sharded(top, side, 2, 1, 1, mesh, **kw)

    rdir = tmp_path / "huge-pb"
    with pytest.raises(KeyboardInterrupt):
        ResumableHugePair(str(rdir), span=3).run(
            top, side, 2, 1, 1, mesh, traceback=False,
            _abort_after_spans=2, **kw
        )
    got = ResumableHugePair(str(rdir), span=3).run(
        top, side, 2, 1, 1, mesh, traceback=False, **kw
    )
    assert got == want
