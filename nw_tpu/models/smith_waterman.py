"""Smith-Waterman local alignment (reference FUTURE WORK, README:179-186).

Same anti-diagonal wavefront machinery as the global fill
(:mod:`nw_tpu.ops.fill_scan`), with the local-alignment recurrence:
scores clamp at zero, the result is the maximum over *all* cells, and
traceback starts at that argmax and stops at the first zero cell.

Arrow bits reuse the global encoding (DIAG=1, LEFT=2, UP=4); a cell
whose best is the zero-clamp gets no arrows (it is a local-alignment
start point).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nw_tpu.ops.fill_scan import NEG_INF


@functools.partial(jax.jit, static_argnames=("with_arrows",))
def sw_fill_diag(top, side, m, k, d, with_arrows: bool = True):
    """Local-alignment fill along anti-diagonals.

    Returns dict with ``score`` (best local score, >= 0), ``argmax``
    (int32[2]: (j, i) cell of the maximum — first hit in diagonal order,
    lowest row index within a diagonal), and ``arrows`` uint8[K, N].
    """
    A = top.shape[0]
    B = side.shape[0]
    N = B + 1
    K = A + B + 1

    m = jnp.asarray(m, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    d = jnp.asarray(d, jnp.int32)

    side_sh = jnp.concatenate([jnp.full((1,), -3, jnp.int32), side.astype(jnp.int32)])
    top_rev = top[::-1].astype(jnp.int32)
    pad = jnp.full((N,), -4, jnp.int32)
    top_ext = jnp.concatenate([pad, top_rev, pad])

    j_idx = jnp.arange(N, dtype=jnp.int32)
    vary0 = (top.sum() + side.sum()).astype(jnp.int32) * 0

    zeros = jnp.zeros((N,), jnp.int32) + vary0
    # row 0 / col 0 are all zero in SW; diagonal 0 likewise
    best0 = jnp.int32(0) + vary0
    arg0 = jnp.zeros((2,), jnp.int32) + vary0

    def step(carry, kk):
        prev, prev2, best, arg = carry
        i_idx = kk - j_idx
        valid = (i_idx >= 0) & (i_idx <= A)
        interior = valid & (j_idx >= 1) & (i_idx >= 1)

        ch_top = jax.lax.dynamic_slice(top_ext, (N + A - kk,), (N,))
        sub = jnp.where(ch_top == side_sh, m, -k)

        prev_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev[:-1]])
        prev2_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev2[:-1]])

        cand_d = prev2_sh + sub
        cand_u = prev_sh - d
        cand_l = prev - d
        score = jnp.maximum(
            jnp.maximum(jnp.maximum(cand_d, cand_u), cand_l), 0
        )
        arrows = (
            ((cand_d == score) & (score > 0)).astype(jnp.uint8)
            | (((cand_l == score) & (score > 0)).astype(jnp.uint8) << 1)
            | (((cand_u == score) & (score > 0)).astype(jnp.uint8) << 2)
        )
        score = jnp.where(interior, score, 0)
        arrows = jnp.where(interior, arrows, jnp.uint8(0))

        # running max; first diagonal wins ties, then lowest row index
        diag_best = jnp.max(score)
        diag_row = jnp.argmax(score).astype(jnp.int32)
        take = diag_best > best
        best = jnp.where(take, diag_best, best)
        arg = jnp.where(take, jnp.stack([diag_row, kk - diag_row]), arg)

        return (score, prev, best, arg), arrows

    ks = jnp.arange(1, K, dtype=jnp.int32)
    (prev, _, best, arg), arrows_tail = jax.lax.scan(
        step, (zeros, zeros, best0, arg0), ks
    )
    out = {"score": best, "argmax": arg}
    if with_arrows:
        out["arrows"] = jnp.concatenate([jnp.zeros((1, N), jnp.uint8), arrows_tail])
    return out


# vmapped uniform-length array oracle (kept under a distinct name; the
# public sw_score_batch below takes byte pairs)
sw_score_array_batch = jax.jit(
    jax.vmap(
        lambda t, s, m, k, d: sw_fill_diag(t, s, m, k, d, with_arrows=False)["score"],
        in_axes=(0, 0, None, None, None),
    )
)


def sw_traceback(arrows_diag: np.ndarray, argmax, top: bytes, side: bytes) -> Tuple[bytes, bytes, Tuple[int, int]]:
    """Host traceback for one local alignment: greedy diag > left > up
    from the argmax cell until a cell with no arrows (score 0).

    Returns (X, Y, (j_start, i_start)) — the aligned substrings and the
    (row, col) cell where the local alignment begins.
    """
    arrows_diag = np.asarray(arrows_diag)
    j, i = (int(x) for x in np.asarray(argmax))
    X = bytearray()
    Y = bytearray()
    while True:
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
        else:
            break
    return bytes(X[::-1]), bytes(Y[::-1]), (j, i)


def sw_align(s1: str | bytes, s2: str | bytes, m: int = 2, k: int = 1, d: int = 1):
    """One-shot local alignment: (score, X, Y, start_cell)."""
    from nw_tpu.ops.encode import encode

    s1b = s1.encode() if isinstance(s1, str) else bytes(s1)
    s2b = s2.encode() if isinstance(s2, str) else bytes(s2)
    out = sw_fill_diag(encode(s1b), encode(s2b), m, k, d)
    X, Y, start = sw_traceback(out["arrows"], out["argmax"], s1b, s2b)
    return int(out["score"]), X, Y, start


def sw_score_batch(pairs, m: int = 2, k: int = 1, d: int = 1):
    """Best local-alignment score per pair (int32[B]).

    Batched production path: the Pallas batch-in-lanes kernel
    (:func:`nw_tpu.ops.variants_pallas.sw_scores_pallas_batch`, 110
    GCUPS/chip at 150bp) on TPU; the same kernel interpreted elsewhere.
    """
    import jax

    from nw_tpu.ops.encode import encode, encode_batch_u8
    from nw_tpu.ops.variants_pallas import sw_scores_pallas_batch

    norm = [
        (a.encode() if isinstance(a, str) else bytes(a),
         b.encode() if isinstance(b, str) else bytes(b))
        for a, b in pairs
    ]
    # uint8 upload: engines cast on device; all outputs are
    # lens/in_rect-gated (tests/test_encode_u8.py)
    tops, sides, l1, l2 = encode_batch_u8(norm)
    interpret = jax.devices()[0].platform != "tpu"
    if sides.shape[1] > 4096 and not interpret:
        # long-side batches of ANY size: the banded kernel (any side
        # length, batch-in-lanes; ops/variants_banded.py — small
        # batches pad to the 128-lane quantum, still far faster than
        # the per-pair scan; VERDICT r2 item 5)
        from nw_tpu.ops.variants_banded import sw_scores_banded_batch

        return np.asarray(
            sw_scores_banded_batch(tops, sides, l1, l2, m, k, d)
        )
    if sides.shape[1] > 4096:
        # the flat score kernel's rolling diagonals outgrow VMEM beyond
        # ~4k sides (probed); small long-pair batches take the per-pair
        # scan engine
        return np.array(
            [
                int(
                    sw_fill_diag(
                        jnp.asarray(encode(a)), jnp.asarray(encode(b)),
                        m, k, d, with_arrows=False,
                    )["score"]
                )
                for a, b in norm
            ],
            np.int32,
        )
    interpret = jax.devices()[0].platform != "tpu"
    from nw_tpu.ops.fill_auto import rowsweep_pick

    rs = (
        None if interpret else
        rowsweep_pick("sw", tops.shape[1], sides.shape[1], len(norm))
    )
    if rs is not None:
        from nw_tpu.ops.variants_rowsweep import sw_scores_rowsweep_batch

        return np.asarray(
            sw_scores_rowsweep_batch(
                tops, sides, l1, l2, m, k, d, rows=rs[0], groups=rs[1]
            )
        )
    return np.asarray(
        sw_scores_pallas_batch(tops, sides, l1, l2, m, k, d, interpret=interpret)
    )


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _sw_walk_packed(words, j0, i0, max_steps: int):
    """Greedy local-alignment walk over packed arrow words (one pair).

    Starts at (j0, i0), follows diag > left > up (sw_traceback order),
    stops at the first zero-arrow cell.  Returns (ops, n) in
    ops_to_strings' corner->origin convention.
    """
    from nw_tpu.ops.traceback import OP_DIAG, OP_LEFT, OP_NONE, OP_UP

    def step(t, st):
        i, j, n, ops, done = st
        kk = i + j
        a = (words[kk >> 2, j] >> ((kk & 3) * 8)) & 0xFF
        active = jnp.logical_and(~done, a != 0)
        take_diag = active & ((a & 1) != 0)
        take_left = active & ~take_diag & ((a & 2) != 0)
        take_up = active & ~take_diag & ~take_left & ((a & 4) != 0)
        op = jnp.where(
            take_diag, OP_DIAG, jnp.where(take_left, OP_LEFT, OP_UP)
        ).astype(jnp.int8)
        ops = ops.at[t].set(jnp.where(active, op, jnp.int8(OP_NONE)))
        i = i - jnp.where(take_diag | take_left, 1, 0)
        j = j - jnp.where(take_diag | take_up, 1, 0)
        n = n + active.astype(jnp.int32)
        done = ~active
        return (i, j, n, ops, done)

    ops0 = jnp.full((max_steps,), int(3), jnp.int8)  # OP_NONE
    i, j, n, ops, _ = jax.lax.fori_loop(
        0, max_steps,
        step,
        (jnp.asarray(i0, jnp.int32), jnp.asarray(j0, jnp.int32),
         jnp.int32(0), ops0, jnp.asarray(False)),
    )
    return ops, n, i, j


@functools.lru_cache(maxsize=None)
def _sw_walk_vmapped(max_steps: int):
    """Cached jitted batched walk (a fresh jax.jit per call recompiles
    every invocation)."""
    return jax.jit(
        jax.vmap(
            lambda w, jj, ii: _sw_walk_packed(w, jj, ii, max_steps=max_steps),
            in_axes=(2, 0, 0),
        )
    )


def sw_align_batch(pairs, m: int = 2, k: int = 1, d: int = 1):
    """Batched local alignment with strings: one (score, X, Y, start)
    per pair, identical to :func:`sw_align` (scan tie rules).

    Production path: the Pallas SW arrows+argmax kernel
    (:func:`nw_tpu.ops.variants_pallas.sw_arrows_pallas_batch`) plus a
    vmapped device walk; host only renders the byte strings.
    """
    from nw_tpu.ops.encode import encode_batch_u8
    from nw_tpu.ops.variants_pallas import sw_arrows_pallas_batch

    norm = [
        (a.encode() if isinstance(a, str) else bytes(a),
         b.encode() if isinstance(b, str) else bytes(b))
        for a, b in pairs
    ]
    # uint8 upload: engines cast on device; all outputs are
    # lens/in_rect-gated (tests/test_encode_u8.py)
    tops, sides, l1, l2 = encode_batch_u8(norm)
    interpret = jax.devices()[0].platform != "tpu"
    if sides.shape[1] > 2048:
        if not interpret:
            # long-side batches of ANY size: the banded SW traceback
            # engine (checkpointed group re-fill; variants_banded.py).
            # Small batches pad to the engine's 128-lane quantum —
            # wasted lanes beat the per-pair scan's ~100x cliff
            # (VERDICT r2 item 5; 32 x 3kb measured 380 s on the scan
            # path vs ~3 s banded).  The LENGTH axis is unbounded but
            # the walk engine's word slab + checkpoint stack scale as
            # batch*length — huge batches sub-split on its budget
            per_pair = 200 * (tops.shape[1] + sides.shape[1])
            chunk = max(128, int(2e9 // per_pair) // 128 * 128)
            if chunk < len(norm):
                out = []
                for i in range(0, len(norm), chunk):
                    out.extend(
                        sw_align_batch(norm[i : i + chunk], m, k, d)
                    )
                return out
            from nw_tpu.ops.variants_banded import sw_traceback_banded_batch

            best, jst, ist, j_end, i_end, ops, n = sw_traceback_banded_batch(
                tops, sides, l1, l2, m, k, d
            )
            from nw_tpu.ops.traceback import ops_to_strings_batch

            ist, jst = np.asarray(ist), np.asarray(jst)
            trunc = [
                (s1[: int(ist[b])], s2[: int(jst[b])])
                for b, (s1, s2) in enumerate(norm)
            ]
            strs = ops_to_strings_batch(np.asarray(ops), np.asarray(n), trunc)
            return [
                (int(best[b]), X, Y, (int(j_end[b]), int(i_end[b])))
                for b, (X, Y) in enumerate(strs)
            ]
        # small long-pair batches: the per-pair scan engine
        return [sw_align(a, b, m, k, d) for a, b in norm]
    words, best, j0, i0 = sw_arrows_pallas_batch(
        tops, sides, l1, l2, m, k, d, interpret=interpret
    )
    max_steps = int(tops.shape[1] + sides.shape[1])
    ops, n, i_end, j_end = _sw_walk_vmapped(max_steps)(words, j0, i0)
    best = np.asarray(best)
    ops, n = np.asarray(ops), np.asarray(n)
    i0n, j0n = np.asarray(i0), np.asarray(j0)
    i_end, j_end = np.asarray(i_end), np.asarray(j_end)
    from nw_tpu.ops.traceback import ops_to_strings_batch

    trunc = [
        (s1[: int(i0n[b])], s2[: int(j0n[b])])
        for b, (s1, s2) in enumerate(norm)
    ]
    strs = ops_to_strings_batch(ops, n, trunc)
    return [
        (int(best[b]), X, Y, (int(j_end[b]), int(i_end[b])))
        for b, (X, Y) in enumerate(strs)
    ]
