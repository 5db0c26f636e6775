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
so every engine agrees): the boundary argmax takes the FIRST maximum
in anti-diagonal order, lowest row index within a diagonal (the
Smith-Waterman rule, smith_waterman.sw_fill_diag); the walk descends
diag > left > up (the DFS order of needleman-wunsch.c:305-324).

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


@functools.partial(jax.jit, static_argnames=("with_arrows",))
def overlap_fill_diag(top, side, m, k, d, with_arrows: bool = True):
    """Overlap-alignment fill along anti-diagonals (one exact-length pair).

    Returns dict with ``score`` (best end-gap-free score, >= 0),
    ``argmax`` (int32[2]: (j, i) boundary cell of the maximum) and
    ``arrows`` uint8[K, N] in the diagonal-major layout of
    smith_waterman.sw_fill_diag.
    """
    A = top.shape[0]
    B = side.shape[0]
    N = B + 1
    K = A + B + 1

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
    vary0 = (top.sum() + side.sum()).astype(jnp.int32) * 0

    # diagonal 0 = cell (0, 0) = 0; every other slot does not exist
    prev0 = jnp.where(j_idx == 0, 0, NEG_INF).astype(jnp.int32) + vary0
    neg = jnp.full((N,), NEG_INF, jnp.int32) + vary0
    # (M, 0) and (0, N) are always reachable at zero cost
    best0 = jnp.int32(0) + vary0
    arg0 = jnp.where(
        A == 0, jnp.stack([jnp.int32(B), jnp.int32(0)]),
        jnp.stack([jnp.int32(0), jnp.asarray(A, jnp.int32)]),
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

        # running max over the END boundary (last row or last column)
        on_end = interior & ((i_idx == A) | (j_idx == B))
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


# vmapped uniform-length array oracle (exact lengths only)
overlap_score_array_batch = jax.jit(
    jax.vmap(
        lambda t, s, m, k, d: overlap_fill_diag(
            t, s, m, k, d, with_arrows=False
        )["score"],
        in_axes=(0, 0, None, None, None),
    )
)


def overlap_traceback(
    arrows_diag: np.ndarray, argmax, top: bytes, side: bytes
) -> Tuple[bytes, bytes, Tuple[int, int]]:
    """Host traceback for one overlap alignment: greedy diag > left > up
    from the boundary argmax until row 0 or column 0.

    Returns (X, Y, (j_start, i_start)) — the aligned overlap segment
    and the (col, row) cell where it begins.
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

    ``start_cell``/``end_cell`` are (col, row) = (j, i) table
    coordinates: the walk runs end -> start; s1[start_i:end_i] and
    s2[start_j:end_j] are the overlapped substrings.
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

    Batched production path: the row-sweep kernel
    (:func:`nw_tpu.ops.variants_rowsweep.overlap_scores_rowsweep_batch`)
    — compiled on TPU, interpreted elsewhere; sides beyond its ~512
    service range take the per-pair scan oracle.
    """
    from nw_tpu.ops.encode import encode, encode_batch
    from nw_tpu.ops.variants_rowsweep import overlap_scores_rowsweep_batch

    norm = [
        (a.encode() if isinstance(a, str) else bytes(a),
         b.encode() if isinstance(b, str) else bytes(b))
        for a, b in pairs
    ]
    tops, sides, l1, l2 = encode_batch(norm)
    interpret = jax.devices()[0].platform != "tpu"
    if sides.shape[1] > 512:
        return np.array(
            [
                int(
                    overlap_fill_diag(
                        jnp.asarray(encode(a)), jnp.asarray(encode(b)),
                        m, k, d, with_arrows=False,
                    )["score"]
                )
                for a, b in norm
            ],
            np.int32,
        )
    return np.asarray(
        overlap_scores_rowsweep_batch(
            tops, sides, l1, l2, m, k, d, interpret=interpret
        )
    )


def overlap_align_batch(pairs, m: int = 2, k: int = 1, d: int = 1):
    """Batched overlap alignment with strings: one
    (score, X, Y, start, end) per pair, identical to
    :func:`overlap_align` (scan tie rules)."""
    return [overlap_align(a, b, m, k, d) for a, b in pairs]
