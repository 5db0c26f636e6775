"""Row-sweep fill engine vs the scan oracle (interpret mode).

The engine's contract is fill_scores_pallas_batch's: exact int32
corner scores for any m/k/d (including the reference's unvalidated
atoi operands — zero and negative params, needleman-wunsch.c:783-785).
"""

import numpy as np
import pytest

from nw_tpu.ops import encode as enc
from nw_tpu.ops.fill_rowsweep import fill_scores_rowsweep_batch
from nw_tpu.ops.fill_scan import fill_scores_batch


def _pairs(rng, n, lo, hi):
    out = []
    for _ in range(n):
        a = rng.integers(65, 69, rng.integers(lo, hi)).astype(np.uint8)
        b = rng.integers(65, 69, rng.integers(lo, hi)).astype(np.uint8)
        out.append((a.tobytes(), b.tobytes()))
    return out


@pytest.mark.parametrize("mkd", [(1, 1, 1), (2, 1, 1), (0, 0, 0), (-2, 3, -1)])
@pytest.mark.parametrize("rows", [2, 8])
def test_rowsweep_vs_oracle(mkd, rows):
    m, k, d = mkd
    rng = np.random.default_rng(11 * rows + m + k + d)
    ps = _pairs(rng, 18, 0, 30) + [
        (b"", b""), (b"GCATGCU", b"GATTACA"), (b"A" * 29, b""),
        (b"", b"T" * 17),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    want = np.asarray(fill_scores_batch(tops, sides, m, k, d, l1, l2))
    got = np.asarray(
        fill_scores_rowsweep_batch(
            tops, sides, l1, l2, m, k, d, rows=rows, interpret=True
        )
    )
    assert (got == want).all()


@pytest.mark.parametrize("rows,groups", [(4, 2), (8, 2), (2, 4)])
def test_rowsweep_groups_vs_oracle(rows, groups):
    """G>1 vregs per vector op (block = G*1024 pairs) must be exact
    for ragged batches smaller AND larger than one block's sublanes."""
    rng = np.random.default_rng(13 * rows + groups)
    ps = _pairs(rng, 21, 0, 30) + [
        (b"", b""), (b"GCATGCU", b"GATTACA"), (b"A" * 29, b""),
        (b"", b"T" * 17),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    want = np.asarray(fill_scores_batch(tops, sides, 2, 1, 1, l1, l2))
    got = np.asarray(
        fill_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=rows, groups=groups,
            interpret=True,
        )
    )
    assert (got == want).all()


def test_rowsweep_ragged_uniform_mix():
    """Mixed ragged lengths around pass boundaries (len1 % R edges)."""
    rng = np.random.default_rng(3)
    ps = []
    for L in (7, 8, 9, 15, 16, 17, 24, 31):
        a = rng.integers(65, 69, L).astype(np.uint8).tobytes()
        b = rng.integers(65, 69, 33 - L).astype(np.uint8).tobytes()
        ps.append((a, b))
    tops, sides, l1, l2 = enc.encode_batch(ps)
    want = np.asarray(fill_scores_batch(tops, sides, 2, 1, 1, l1, l2))
    got = np.asarray(
        fill_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=8, interpret=True
        )
    )
    assert (got == want).all()


@pytest.mark.parametrize("mkd", [(1, 1, 1), (0, 0, 0), (-2, 3, -1)])
def test_greedy_rowsweep_walk_first_emission(mkd):
    """Row-sweep 2-bit arrows + row-major walker reproduce the FIRST
    alignment the reference DFS emits (diag > left > up descend order,
    needleman-wunsch.c:305-324), via the exact enumerator as oracle."""
    import jax.numpy as jnp

    from nw_tpu.models.needleman_wunsch import align
    from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
    from nw_tpu.ops.fill_scan import fill_scores_batch
    from nw_tpu.ops.traceback import (
        ops_to_strings,
        traceback_greedy2_rowmajor_batch,
    )

    m, k, d = mkd
    rng = np.random.default_rng(29 + m + k + d)
    ps = _pairs(rng, 14, 0, 28) + [
        (b"", b""), (b"GCATGCU", b"GATTACA"), (b"A" * 19, b""),
        (b"", b"T" * 23),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    L1, L2 = tops.shape[1], sides.shape[1]
    want_sc = np.asarray(fill_scores_batch(tops, sides, m, k, d, l1, l2))
    groups = 2 if (m, k, d) == (1, 1, 1) else 1
    words, sc = fill_greedy_rowsweep_batch(
        tops, sides, l1, l2, m, k, d, rows=4, groups=groups,
        interpret=True,
    )
    assert (np.asarray(sc) == want_sc).all()
    ops, n = traceback_greedy2_rowmajor_batch(
        words[:, :, : len(ps)], jnp.asarray(l1), jnp.asarray(l2),
        max_steps=L1 + L2,
    )
    ops, n = np.asarray(ops), np.asarray(n)
    for b, (a, s2) in enumerate(ps):
        X, Y = ops_to_strings(ops[b], int(n[b]), a, s2)
        wX, wY = next(iter(align(a, s2, m, k, d).alignments(1)), (b"", b""))
        assert (X, Y) == (wX, wY), (b, a, s2)


@pytest.mark.parametrize("mkd", [(2, 1, 1), (3, -1, 2)])
def test_sw_rowsweep_vs_oracle(mkd):
    import jax.numpy as jnp

    from nw_tpu.models.smith_waterman import sw_fill_diag
    from nw_tpu.ops.variants_rowsweep import sw_scores_rowsweep_batch

    m, k, d = mkd
    rng = np.random.default_rng(41 + m + k + d)
    ps = _pairs(rng, 14, 0, 28) + [
        (b"", b""), (b"AAAA", b"TTTT"), (b"A" * 19, b""), (b"", b"T" * 23),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    groups = 2 if (m, k, d) == (2, 1, 1) else 1
    got = np.asarray(
        sw_scores_rowsweep_batch(
            tops, sides, l1, l2, m, k, d, rows=4, groups=groups,
            interpret=True,
        )
    )
    for b, (a, s2) in enumerate(ps):
        t = jnp.asarray(enc.encode(a))
        si = jnp.asarray(enc.encode(s2))
        want = int(sw_fill_diag(t, si, m, k, d, with_arrows=False)["score"])
        assert got[b] == want, b


def test_affine_rowsweep_vs_oracle():
    import jax.numpy as jnp

    from nw_tpu.models.affine import affine_score
    from nw_tpu.ops.variants_rowsweep import affine_scores_rowsweep_batch

    rng = np.random.default_rng(43)
    ps = _pairs(rng, 14, 0, 28) + [
        (b"", b""), (b"GCATGCU", b"GATTACA"), (b"A" * 19, b""),
        (b"", b"T" * 23),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    for gi, (m, k, o, e) in enumerate([(2, 1, 3, 1), (2, 2, 5, 2)]):
        got = np.asarray(
            affine_scores_rowsweep_batch(
                tops, sides, l1, l2, m, k, o, e, rows=8,
                groups=1 + gi, interpret=True,
            )
        )
        for b, (a, s2) in enumerate(ps):
            if not (a or s2):
                want = 0
            else:
                t = jnp.asarray(enc.encode(a))
                si = jnp.asarray(enc.encode(s2))
                want = int(affine_score(t, si, m, k, o, e))
            assert got[b] == want, b


@pytest.mark.parametrize("mkd", [(1, 1, 1), (0, 0, 0), (-2, 3, -1)])
def test_scores_counts_rowsweep_vs_oracle(mkd):
    """Fused score+count (the -q -s path): uint32-wrap count parity."""
    import jax
    import jax.numpy as jnp

    from nw_tpu.ops import pathcount
    from nw_tpu.ops.fill_rowsweep import fill_scores_counts_rowsweep_batch
    from nw_tpu.ops.fill_scan import fill_diag_batch

    m, k, d = mkd
    rng = np.random.default_rng(47 + m + k + d)
    ps = _pairs(rng, 16, 0, 26) + [
        (b"", b""), (b"GT", b"GA"), (b"A" * 19, b""), (b"", b"T" * 23),
    ]
    tops, sides, l1, l2 = enc.encode_batch(ps)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = fill_diag_batch(tops, sides, m, k, d, l1j, l2j)
    want_ct = np.asarray(
        jax.vmap(pathcount.count_paths)(ref["arrows"], l1j, l2j)
    )
    sc, ct = fill_scores_counts_rowsweep_batch(
        tops, sides, l1, l2, m, k, d, rows=4,
        groups=2 if (m, k, d) == (1, 1, 1) else 1, interpret=True,
    )
    assert (np.asarray(sc) == np.asarray(ref["score"])).all()
    assert (np.asarray(ct) == want_ct).all()


def test_rowsweep_pick_routing():
    """fill_auto.rowsweep_pick: tuned knobs, VMEM-fit group shrinking,
    block-padding-aware group choice, pinned-env no-shrink rule."""
    import os

    from nw_tpu.ops.fill_auto import (
        GREEDY_MAX_SIDE_X_GROUPS,
        ROWSWEEP_MAX_SIDE,
        ROWSWEEP_TUNED,
        rowsweep_pick,
    )

    assert os.environ.get("NW_TPU_ROWSWEEP", "1") == "1"
    assert "NW_TPU_ROWSWEEP_GROUPS" not in os.environ

    # tuned winners at block-aligned batches
    assert rowsweep_pick("score", 150, 150, 12288) == ROWSWEEP_TUNED["score"]
    assert rowsweep_pick("greedy", 150, 150, 12288) == ROWSWEEP_TUNED["greedy"]

    # padding-aware: 10240 % 4096 != 0 -> greedy halves groups to the
    # padding-free block; 10240 % 2048 == 0 keeps the score winner
    rows_g, _ = ROWSWEEP_TUNED["greedy"]
    assert rowsweep_pick("greedy", 150, 150, 10240) == (rows_g, 2)
    assert rowsweep_pick("score", 150, 150, 10240) == ROWSWEEP_TUNED["score"]

    # VMEM fit: the greedy engine only caps the side; score-family caps
    # both sequences (whole tops bucket resident)
    assert rowsweep_pick("greedy", 9999, 512, 4096) == (rows_g, 1)
    assert rowsweep_pick("greedy", 150, GREEDY_MAX_SIDE_X_GROUPS + 1, 4096) is None
    assert rowsweep_pick("score", 300, 300, 4096) == (
        ROWSWEEP_TUNED["score"][0], 1)
    assert rowsweep_pick("score", ROWSWEEP_MAX_SIDE + 1, 100, 4096) is None

    # batch floor and opt-out
    assert rowsweep_pick("score", 150, 150, 512) is None
    os.environ["NW_TPU_ROWSWEEP"] = "0"
    try:
        assert rowsweep_pick("score", 150, 150, 12288) is None
    finally:
        del os.environ["NW_TPU_ROWSWEEP"]

    # pinned groups never shrink: a fit pinned geometry is honored
    # verbatim, an unfit one falls through (no silent halving)
    os.environ["NW_TPU_ROWSWEEP_GROUPS"] = "2"
    try:
        assert rowsweep_pick("score", 150, 150, 12288) == (
            ROWSWEEP_TUNED["score"][0], 2)
        assert rowsweep_pick("score", 300, 300, 12288) is None
    finally:
        del os.environ["NW_TPU_ROWSWEEP_GROUPS"]


def test_rowsweep_tuned_file(tmp_path, monkeypatch):
    """rowsweep_knobs reads the tuner's persisted winners; env pins
    still override; a missing/corrupt file falls back to defaults."""
    import json

    import nw_tpu.ops.fill_auto as fa

    path = tmp_path / "tuned.json"
    monkeypatch.setenv("NW_TPU_TUNED_FILE", str(path))
    monkeypatch.delenv("NW_TPU_ROWSWEEP_ROWS", raising=False)
    monkeypatch.delenv("NW_TPU_ROWSWEEP_GROUPS", raising=False)

    fa._TUNED_CACHE = None  # drop the per-process cache
    assert fa.rowsweep_knobs("score") == fa.ROWSWEEP_TUNED["score"]

    path.write_text(json.dumps(
        {"platform": "tpu", "engines": {"score": [4, 1], "greedy": [8, 2]}}
    ))
    fa._TUNED_CACHE = None
    assert fa.rowsweep_knobs("score") == (4, 1)
    assert fa.rowsweep_knobs("greedy") == (8, 2)
    # engines absent from the file keep the checked-in defaults
    assert fa.rowsweep_knobs("affine") == fa.ROWSWEEP_TUNED["affine"]
    # env pins beat the file
    monkeypatch.setenv("NW_TPU_ROWSWEEP_ROWS", "16")
    assert fa.rowsweep_knobs("score") == (16, 1)
    monkeypatch.delenv("NW_TPU_ROWSWEEP_ROWS")

    path.write_text("{not json")
    fa._TUNED_CACHE = None
    assert fa.rowsweep_knobs("score") == fa.ROWSWEEP_TUNED["score"]
    fa._TUNED_CACHE = None  # leave no test state behind
