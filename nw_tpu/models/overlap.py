"""Overlap (semi-global, end-gap-free) alignment — the third of the
reference's "three classic sequence alignment algorithms" (FUTURE WORK,
README:182-187; only NW ships, SW/overlap are wishlist).

Recurrence: Needleman-Wunsch's interior recurrence with FREE end gaps —
row 0 and column 0 are all zero (leading gaps in either sequence cost
nothing) and the result is the maximum over the LAST row and LAST
column (trailing gaps cost nothing).  The traceback starts at that
boundary argmax and stops on reaching row 0 or column 0; the aligned
strings cover only the overlapping segment, with the start/end cells
reported so callers can reconstruct the full end-gapped layout.

Scores never clamp at zero (unlike Smith-Waterman) but the overlap
score is always >= 0: the last row/column contain the zero-cost cells
(M, 0) and (0, N).

Tie rules (new surface — no reference semantics to match; fixed here
so every engine agrees): the trivial zero-cost corner — (len1, 0), or
(0, len2) when len1 == 0 — seeds the argmax, and an end-boundary cell
replaces it only with a STRICTLY greater score; so a best score of 0
always reports the empty overlap at that corner.  Among positive
maxima the argmax takes the FIRST in anti-diagonal order, lowest row
index within a diagonal (the Smith-Waterman rule,
smith_waterman.sw_fill_diag); the walk descends diag > left > up (the
DFS order of needleman-wunsch.c:305-324).

Arrow bits reuse the global encoding (DIAG=1, LEFT=2, UP=4,
needleman-wunsch.c:485-503); boundary cells get no arrows (they are
walk stop cells).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nw_tpu.ops.fill_scan import NEG_INF

# overlap_align_batch sub-batch sizing: the fill's diagonal-major uint8
# arrows (B, K, N) held at once are capped to this many bytes
ALIGN_ARROWS_HBM_BUDGET = 1_000_000_000


@functools.partial(jax.jit, static_argnames=("with_arrows",))
def overlap_fill_diag(
    top, side, m, k, d, len1=None, len2=None, with_arrows: bool = True
):
    """Overlap-alignment fill along anti-diagonals (one pair, possibly
    padded — ``len1``/``len2`` are the true lengths; padding cannot
    contaminate the true rectangle because the recurrence only reads
    smaller indices, and the end-boundary argmax is masked to it).

    Returns dict with ``score`` (best end-gap-free score, >= 0),
    ``argmax`` (int32[2]: (j, i) boundary cell of the maximum) and
    ``arrows`` uint8[K, N] in the diagonal-major layout of
    smith_waterman.sw_fill_diag.
    """
    A = top.shape[0]
    B = side.shape[0]
    N = B + 1
    K = A + B + 1

    if len1 is None:
        len1 = A
    if len2 is None:
        len2 = B
    len1 = jnp.asarray(len1, jnp.int32)
    len2 = jnp.asarray(len2, jnp.int32)

    m = jnp.asarray(m, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    d = jnp.asarray(d, jnp.int32)

    side_sh = jnp.concatenate(
        [jnp.full((1,), -3, jnp.int32), side.astype(jnp.int32)]
    )
    top_rev = top[::-1].astype(jnp.int32)
    pad = jnp.full((N,), -4, jnp.int32)
    top_ext = jnp.concatenate([pad, top_rev, pad])

    j_idx = jnp.arange(N, dtype=jnp.int32)
    vary0 = (top.sum() + side.sum() + len1 + len2).astype(jnp.int32) * 0

    # diagonal 0 = cell (0, 0) = 0; every other slot does not exist
    prev0 = jnp.where(j_idx == 0, 0, NEG_INF).astype(jnp.int32) + vary0
    neg = jnp.full((N,), NEG_INF, jnp.int32) + vary0
    # (len1, 0) and (0, len2) are always reachable at zero cost
    best0 = jnp.int32(0) + vary0
    arg0 = jnp.where(
        len1 == 0,
        jnp.stack([len2, jnp.int32(0)]),
        jnp.stack([jnp.int32(0), len1]),
    ) + vary0

    def step(carry, kk):
        prev, prev2, best, arg = carry
        i_idx = kk - j_idx
        valid = (i_idx >= 0) & (i_idx <= A)
        interior = valid & (j_idx >= 1) & (i_idx >= 1)

        ch_top = jax.lax.dynamic_slice(top_ext, (N + A - kk,), (N,))
        sub = jnp.where(ch_top == side_sh, m, -k)

        prev_sh = jnp.concatenate(
            [jnp.full((1,), NEG_INF, jnp.int32), prev[:-1]]
        )
        prev2_sh = jnp.concatenate(
            [jnp.full((1,), NEG_INF, jnp.int32), prev2[:-1]]
        )

        cand_d = prev2_sh + sub
        cand_u = prev_sh - d  # from (i, j-1): consumes side
        cand_l = prev - d  # from (i-1, j): consumes top
        score = jnp.maximum(jnp.maximum(cand_d, cand_u), cand_l)
        arrows = (
            (cand_d == score).astype(jnp.uint8)
            | ((cand_l == score).astype(jnp.uint8) << 1)
            | ((cand_u == score).astype(jnp.uint8) << 2)
        )
        # free boundaries: row 0 / col 0 are zero, no arrows
        score = jnp.where(interior, score, jnp.where(valid, 0, NEG_INF))
        arrows = jnp.where(interior, arrows, jnp.uint8(0))

        # running max over the END boundary (last TRUE row or column)
        on_end = (
            interior
            & ((i_idx == len1) | (j_idx == len2))
            & (i_idx <= len1)
            & (j_idx <= len2)
        )
        masked = jnp.where(on_end, score, NEG_INF)
        diag_best = jnp.max(masked)
        diag_row = jnp.argmax(masked).astype(jnp.int32)
        take = diag_best > best
        best = jnp.where(take, diag_best, best)
        arg = jnp.where(take, jnp.stack([diag_row, kk - diag_row]), arg)

        return (score, prev, best, arg), arrows

    ks = jnp.arange(1, K, dtype=jnp.int32)
    (prev, _, best, arg), arrows_tail = jax.lax.scan(
        step, (prev0, neg, best0, arg0), ks
    )
    out = {"score": best, "argmax": arg}
    if with_arrows:
        out["arrows"] = jnp.concatenate(
            [jnp.zeros((1, N), jnp.uint8), arrows_tail]
        )
    return out


# ragged batched fills (padded to a bucket; lens mask the argmax) —
# any side length, pure XLA scan, no per-shape recompiles
overlap_scores_scan_batch = jax.jit(
    jax.vmap(
        lambda t, s, m, k, d, l1, l2: overlap_fill_diag(
            t, s, m, k, d, l1, l2, with_arrows=False
        )["score"],
        in_axes=(0, 0, None, None, None, 0, 0),
    )
)

_overlap_fill_batch = jax.jit(
    jax.vmap(
        lambda t, s, m, k, d, l1, l2: overlap_fill_diag(
            t, s, m, k, d, l1, l2, with_arrows=True
        ),
        in_axes=(0, 0, None, None, None, 0, 0),
    )
)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _overlap_walk_diag(arrows, j0, i0, max_steps: int):
    """Greedy overlap walk over diagonal-major uint8 arrows (one pair):
    diag > left > up from (j0, i0) until row 0 or column 0.  Returns
    (ops, n) in ops_to_strings' end->origin convention (OP_LEFT
    consumes s1, OP_UP consumes s2)."""
    from nw_tpu.ops.traceback import OP_DIAG, OP_LEFT, OP_NONE, OP_UP

    def step(t, st):
        i, j, n, ops, done = st
        a = arrows[i + j, j]
        active = ~done & (i > 0) & (j > 0) & (a != 0)
        take_diag = active & ((a & 1) != 0)
        take_left = active & ~take_diag & ((a & 2) != 0)
        op = jnp.where(
            take_diag, OP_DIAG,
            jnp.where(take_left, OP_LEFT, OP_UP),
        ).astype(jnp.int8)
        ops = ops.at[t].set(jnp.where(active, op, jnp.int8(OP_NONE)))
        i = i - jnp.where(take_diag | take_left, 1, 0)
        j = j - jnp.where(active & ~take_left, 1, 0)
        n = n + active.astype(jnp.int32)
        return (i, j, n, ops, ~active | done)

    ops0 = jnp.full((max_steps,), int(3), jnp.int8)  # OP_NONE
    i, j, n, ops, _ = jax.lax.fori_loop(
        0, max_steps, step,
        (jnp.asarray(i0, jnp.int32), jnp.asarray(j0, jnp.int32),
         jnp.int32(0), ops0, jnp.asarray(False)),
    )
    return ops, n, i, j


@functools.lru_cache(maxsize=None)
def _overlap_walk_vmapped(max_steps: int):
    """Cached jitted batched walk (a fresh jax.jit per call recompiles
    every invocation)."""
    return jax.jit(
        jax.vmap(
            lambda a, jj, ii: _overlap_walk_diag(
                a, jj, ii, max_steps=max_steps
            ),
            in_axes=(0, 0, 0),
        )
    )


def overlap_traceback(
    arrows_diag: np.ndarray, argmax, top: bytes, side: bytes
) -> Tuple[bytes, bytes, Tuple[int, int]]:
    """Host traceback for one overlap alignment: greedy diag > left > up
    from the boundary argmax until row 0 or column 0.

    Returns (X, Y, (j_start, i_start)) — the aligned overlap segment
    and the (row, col) cell where it begins (j indexes ``side`` = s2,
    the table's row axis; same layout as sw_traceback's).
    """
    arrows_diag = np.asarray(arrows_diag)
    j, i = (int(x) for x in np.asarray(argmax))
    X = bytearray()
    Y = bytearray()
    while i > 0 and j > 0:
        a = int(arrows_diag[i + j, j])
        if a & 1:
            i -= 1
            j -= 1
            X.append(top[i])
            Y.append(side[j])
        elif a & 2:
            i -= 1
            X.append(top[i])
            Y.append(ord("-"))
        elif a & 4:
            j -= 1
            X.append(ord("-"))
            Y.append(side[j])
        else:  # boundary cell reached exactly
            break
    return bytes(X[::-1]), bytes(Y[::-1]), (j, i)


def overlap_align(
    s1: str | bytes, s2: str | bytes, m: int = 2, k: int = 1, d: int = 1
):
    """One-shot overlap alignment: (score, X, Y, start_cell, end_cell).

    ``start_cell``/``end_cell`` are (j, i) table coordinates — j
    indexes s2 (the row axis), i indexes s1 — the walk runs
    end -> start; s1[start_i:end_i] and s2[start_j:end_j] are the
    overlapped substrings.
    """
    from nw_tpu.ops.encode import encode

    s1b = s1.encode() if isinstance(s1, str) else bytes(s1)
    s2b = s2.encode() if isinstance(s2, str) else bytes(s2)
    out = overlap_fill_diag(encode(s1b), encode(s2b), m, k, d)
    X, Y, start = overlap_traceback(out["arrows"], out["argmax"], s1b, s2b)
    j_end, i_end = (int(x) for x in np.asarray(out["argmax"]))
    return int(out["score"]), X, Y, start, (j_end, i_end)


def overlap_score_batch(pairs, m: int = 2, k: int = 1, d: int = 1):
    """Best overlap score per pair (int32[B]).

    Batched production path on TPU: the row-sweep Pallas kernel
    (:func:`nw_tpu.ops.variants_rowsweep.overlap_scores_rowsweep_batch`)
    when the bucket fits its VMEM plan (fill_auto.rowsweep_pick);
    the banded kernel
    (:func:`nw_tpu.ops.variants_banded.overlap_scores_banded_batch`)
    at ANY side length beyond.  Elsewhere the vmapped ragged scan fill
    (one compile per padded bucket, no per-pair cliff).
    """
    from nw_tpu.ops.encode import encode_batch_u8

    norm = [
        (a.encode() if isinstance(a, str) else bytes(a),
         b.encode() if isinstance(b, str) else bytes(b))
        for a, b in pairs
    ]
    # uint8 upload: engines cast on device; all outputs are
    # lens/in_rect-gated (tests/test_encode_u8.py)
    tops, sides, l1, l2 = encode_batch_u8(norm)
    on_tpu = jax.devices()[0].platform == "tpu"
    from nw_tpu.ops.fill_auto import rowsweep_pick

    rs = (
        rowsweep_pick("overlap", tops.shape[1], sides.shape[1], len(norm))
        if on_tpu else None
    )
    if rs is not None:
        from nw_tpu.ops.variants_rowsweep import (
            overlap_scores_rowsweep_batch,
        )

        return np.asarray(
            overlap_scores_rowsweep_batch(
                tops, sides, l1, l2, m, k, d, rows=rs[0], groups=rs[1]
            )
        )
    if on_tpu:
        from nw_tpu.ops.variants_banded import overlap_scores_banded_batch

        return np.asarray(
            overlap_scores_banded_batch(tops, sides, l1, l2, m, k, d)
        )
    return np.asarray(
        overlap_scores_scan_batch(
            tops, sides, m, k, d, jnp.asarray(l1), jnp.asarray(l2)
        )
    )


def overlap_align_batch(pairs, m: int = 2, k: int = 1, d: int = 1):
    """Batched overlap alignment with strings: one
    (score, X, Y, start, end) per pair, identical to
    :func:`overlap_align` (scan tie rules).

    Batched fill + vmapped device walk (one compile per padded bucket);
    host only renders the byte strings through the native batch
    builder.  The batched fill materializes diagonal-major uint8 arrows
    (B, K, N) — ~200 MB per 10 kb pair — so long-side batches are
    auto-split into sub-batches whose arrows fit ~1 GB of HBM at a
    time (one compile per sub-batch shape, not per pair)."""
    norm = [
        (a.encode() if isinstance(a, str) else bytes(a),
         b.encode() if isinstance(b, str) else bytes(b))
        for a, b in pairs
    ]
    if not norm:
        return []
    A = max((len(a) for a, _ in norm), default=0)
    Bs = max((len(b) for _, b in norm), default=0)
    if Bs > 2048 and jax.devices()[0].platform == "tpu":
        # long sides on TPU: the banded checkpointed walk engine — the
        # full arrows are never materialized (group re-fills), so the
        # LENGTH axis is unbounded; the BATCH axis still is not (the
        # pass-2 word slab and checkpoint stack scale as batch*length),
        # so big batches sub-split on the walk engine's budget
        per_pair = 200 * (A + Bs)  # word slab + checkpoints, ~bytes
        chunk = max(128, int(2e9 // max(per_pair, 1)) // 128 * 128)
        if chunk < len(norm):
            out = []
            for i in range(0, len(norm), chunk):
                out.extend(
                    _overlap_align_banded_bucket(
                        norm[i : i + chunk], m, k, d
                    )
                )
            return out
        return _overlap_align_banded_bucket(norm, m, k, d)
    per_pair = (A + Bs + 1) * (Bs + 1)  # arrows bytes (uint8)
    chunk = max(1, int(ALIGN_ARROWS_HBM_BUDGET // max(per_pair, 1)))
    if chunk < len(norm):
        out = []
        for i in range(0, len(norm), chunk):
            out.extend(_overlap_align_bucket(norm[i : i + chunk], m, k, d))
        return out
    return _overlap_align_bucket(norm, m, k, d)


def _overlap_align_banded_bucket(norm, m, k, d):
    """One walk-engine-sized sub-batch of long-side overlap alignments
    (see overlap_align_batch)."""
    from nw_tpu.ops.encode import encode_batch_u8
    from nw_tpu.ops.traceback import ops_to_strings_batch
    from nw_tpu.ops.variants_banded import overlap_traceback_banded_batch

    # uint8 upload: engines cast on device; all outputs are
    # lens/in_rect-gated (tests/test_encode_u8.py)
    tops, sides, l1, l2 = encode_batch_u8(norm)
    best, jst, ist, j_end, i_end, ops, n = (
        overlap_traceback_banded_batch(tops, sides, l1, l2, m, k, d)
    )
    trunc = [
        (s1[: int(ist[b])], s2[: int(jst[b])])
        for b, (s1, s2) in enumerate(norm)
    ]
    strs = ops_to_strings_batch(ops, n, trunc)
    return [
        (int(best[b]), X, Y, (int(j_end[b]), int(i_end[b])),
         (int(jst[b]), int(ist[b])))
        for b, (X, Y) in enumerate(strs)
    ]


def _overlap_align_bucket(norm, m, k, d):
    """One HBM-sized sub-batch of overlap alignments (see
    overlap_align_batch)."""
    from nw_tpu.ops.encode import encode_batch_u8
    from nw_tpu.ops.traceback import ops_to_strings_batch

    # uint8 upload: engines cast on device; all outputs are
    # lens/in_rect-gated (tests/test_encode_u8.py)
    tops, sides, l1, l2 = encode_batch_u8(norm)
    out = _overlap_fill_batch(
        tops, sides, m, k, d, jnp.asarray(l1), jnp.asarray(l2)
    )
    arg = np.asarray(out["argmax"])
    j_end, i_end = arg[:, 0], arg[:, 1]
    max_steps = int(tops.shape[1] + sides.shape[1])
    if max_steps == 0:
        return [(0, b"", b"", (0, 0), (0, 0)) for _ in norm]
    ops, n, i_st, j_st = _overlap_walk_vmapped(max_steps)(
        out["arrows"], jnp.asarray(j_end), jnp.asarray(i_end)
    )
    ops, n = np.asarray(ops), np.asarray(n)
    i_st, j_st = np.asarray(i_st), np.asarray(j_st)
    trunc = [
        (s1[: int(i_end[b])], s2[: int(j_end[b])])
        for b, (s1, s2) in enumerate(norm)
    ]
    strs = ops_to_strings_batch(ops, n, trunc)
    best = np.asarray(out["score"])
    return [
        (int(best[b]), X, Y, (int(j_st[b]), int(i_st[b])),
         (int(j_end[b]), int(i_end[b])))
        for b, (X, Y) in enumerate(strs)
    ]
