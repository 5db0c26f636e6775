"""Pallas TPU wavefront fill kernels.

The production fill for batched pairs.  Where the reference parallelizes
one pair across pthreads with per-cell mutexes (needleman-wunsch.c:444-475),
this kernel parallelizes across *pairs* — the batch dimension sits in the
128 vector lanes, the anti-diagonal sits in sublanes — and sequences the
wavefront with a plain ``fori_loop``: the dependency order is the loop
order, so there is nothing to lock.

Memory behavior (the whole point of the design):

* the two rolling diagonals live in a VMEM ping-pong buffer
  ``(2, N, BT)`` — scores never touch HBM during the fill;
* the encoded sequences are loaded once per batch block into VMEM;
* for score-only fills (reference ``-q`` mode) the only HBM write is the
  final ``(1, BT)`` score row per block.

Layout per batch block (BT = 128 pairs wide):

* ``sides_sh``: int32[N, BT] — side char per row j (row 0 = sentinel);
* ``tops_ext``: int32[2N+A, BT] — reversed, padded top strings such that
  the chars needed by diagonal ``kk`` are rows ``N+A-kk .. N+A-kk+N`` —
  one dynamic sublane slice per step (same trick as
  :mod:`nw_tpu.ops.fill_scan`);
* per step: compare, three adds, two maxes, arrowless (score-only);
  the true-corner score is captured by a masked reduce when the
  wavefront crosses each pair's ``len1+len2`` diagonal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP

# plain Python int: jnp scalars at module scope would be captured as
# constants by the kernel tracer, which pallas_call rejects
NEG_INF = -(2**30)
LANES = 128


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _scores_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, out_ref, prev_ref, prev2_ref,
    ch_ref, cap_ref
):
    """One grid step = one block of BT pairs, full wavefront in VMEM.

    The rolling state — two previous diagonals, the top-character
    register, and the captured corner scores — is loop-carried (register
    / VMEM managed by Mosaic), not scratch refs, so each step is pure
    vector ops with no ref round-trips.

    The top character needed at (diag kk, row j) is top[kk-1-j]; between
    consecutive diagonals this is a shift-down-one-row with top[kk-1]
    entering at row 0 — a rolling register fed by a single-row dynamic
    slice, instead of re-slicing N rows per step.

    Refs:
      mkd_ref:   SMEM (1, 3) int32 — m, k, d
      tops_ref:  VMEM (A_pad, BT) int32 — top chars, row i = top[i]
      sides_ref: VMEM (N, BT) int32 — shifted side chars (row 0 sentinel)
      lens_ref:  VMEM (2, BT) int32 — row 0 = len1, row 1 = len2
      out_ref:   VMEM (1, BT) int32 — true-corner scores
    """
    N, BT = sides_ref.shape
    A_pad = tops_ref.shape[0]
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]  # (1, BT)
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2  # (1, BT)

    # diagonal 0: cell (0,0) = 0, everything else outside the table
    prev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG_INF))
    prev2_ref[...] = jnp.full((N, BT), NEG_INF, jnp.int32)
    # cap holds per-lane corner scores at full (N, BT) shape; each lane's
    # corner score lands in the row it was hit at, reduced once at the end.
    cap_ref[...] = jnp.where(
        (k_corner == 0) & (j_iota == 0), jnp.int32(0), jnp.int32(NEG_INF)
    )
    ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)  # no top chars on diag 0

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG_INF, jnp.int32)

    def body(kk, _):
        prev = prev_ref[...]
        prev2 = prev2_ref[...]

        # roll the top-char register: row j now needs top[kk-1-j]
        new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
        ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
        ch_ref[...] = ch_top
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
        prev2_sh = jnp.concatenate([neg_row, prev2[:-1, :]], axis=0)

        score = jnp.maximum(
            jnp.maximum(prev2_sh + sub, prev_sh - d), prev - d
        )

        # boundary row 0 (j == 0) and column 0 (i == 0 -> j == kk):
        # score = -kk * d (computation.c:104-120; both boundaries share
        # the same value on diagonal kk).
        boundary = (j_iota == 0) | (j_iota == kk)
        score = jnp.where(boundary, -kk * d, score)

        # capture the true-corner score as the wavefront crosses it
        hit = (k_corner == kk) & (j_iota == len2)  # (N, BT), <=1 hit/lane
        cap_ref[...] = jnp.where(hit, score, cap_ref[...])

        prev2_ref[...] = prev
        prev_ref[...] = score
        return 0

    K = (A_pad - 1) + (N - 1)  # last diagonal index (kk-1 < A_pad needed)
    jax.lax.fori_loop(1, K + 1, body, 0)
    out_ref[...] = jnp.max(cap_ref[...], axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_pairs")
)
def fill_scores_pallas_batch(
    tops,
    sides,
    lens1,
    lens2,
    m,
    k,
    d,
    interpret: bool = False,
    block_pairs: int = LANES,
):
    """Score a batch of pairs with the Pallas wavefront kernel.

    Args:
      tops: int32[B, A] encoded top strings (PAD_TOP padded).
      sides: int32[B, Bs] encoded side strings (PAD_SIDE padded).
      lens1, lens2: int32[B] true lengths.
      m, k, d: scoring params.
    Returns:
      int32[B] optimal scores (true corner per pair).
    """
    nb, A = tops.shape
    _, Bs = sides.shape

    # pad the side bucket so N = Bs+1 is a sublane multiple, the top
    # bucket to a sublane multiple, and the batch to a lane multiple
    # (extra lanes are dummy pairs)
    N = _round_up(Bs + 1, 8)
    Bs_pad = N - 1
    A_pad = _round_up(max(A, 1), 8)
    BT = block_pairs
    nb_pad = _round_up(max(nb, 1), BT)

    tops = jnp.pad(
        tops, ((0, nb_pad - nb), (0, A_pad - A)), constant_values=PAD_TOP
    )
    sides = jnp.pad(
        sides, ((0, nb_pad - nb), (0, Bs_pad - Bs)), constant_values=PAD_SIDE
    )
    lens1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nb_pad - nb))
    lens2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nb_pad - nb))

    # (N, nb) side chars, shifted: row j holds side[j-1]
    sides_sh = jnp.concatenate(
        [jnp.full((nb_pad, 1), -3, jnp.int32), sides.astype(jnp.int32)], axis=1
    ).T
    tops_t = tops.astype(jnp.int32).T  # (A_pad, nb): row i = top[i]
    lens = jnp.stack([lens1, lens2], axis=0)  # (2, nb)
    mkd = jnp.array([[m, k, d]], jnp.int32)

    grid = (nb_pad // BT,)
    out = pl.pallas_call(
        _scores_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((N, BT), jnp.int32),  # prev diagonal
                pltpu.VMEM((N, BT), jnp.int32),  # prev2 diagonal
                pltpu.VMEM((N, BT), jnp.int32),  # rolling top chars
                pltpu.VMEM((N, BT), jnp.int32),  # captured corner scores
            ],
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return out[0, :nb]


# ---------------------------------------------------------------------------
# Arrows-emitting kernel (traceback batches)
# ---------------------------------------------------------------------------
#
# Same batch-in-lanes layout as the score kernel (batch on the 128 lanes,
# anti-diagonal on sublanes); the grid gains an inner dimension that
# streams CHUNK-diagonal arrow slabs to HBM while the rolling state
# persists in VMEM scratch (TPU grid execution is sequential, so scratch
# carries across the c dimension of one batch block).
#
# The emitted uint8 slabs are exactly the diagonal-major arrow table of
# ops/fill_scan.py (same bit semantics as the reference's walk-table
# flags, needleman-wunsch.c:485-503).
#
# VMEM bounds this kernel to side lengths of ~2k (state + slab must fit);
# longer pairs use the lax.scan fill or, for scores only, the
# sequence-sharded wavefront (parallel/wavefront.py).

ARROW_CHUNK = 32  # diagonals per grid step (uint8 sublane tile)


def _arrows_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, arrows_ref, score_ref,
    prev_ref, prev2_ref, ch_ref, cap_ref
):
    """Grid (batch_blocks, K_pad // ARROW_CHUNK).

    Refs:
      mkd_ref:    SMEM (1, 3) int32 — m, k, d
      tops_ref:   VMEM (A_pad, BT) int32 — top chars, row i = top[i]
      sides_ref:  VMEM (N, BT) int32 — side char per row j (row 0 sentinel)
      lens_ref:   VMEM (2, BT) int32 — len1, len2 per pair
      arrows_ref: VMEM (ARROW_CHUNK, N, BT) uint8 out slab
      score_ref:  VMEM (1, BT) int32 out — per-pair corner scores
      prev/prev2/ch/cap: VMEM (N, BT) int32 scratch, persistent across c
    """
    _, N, BT = arrows_ref.shape
    A_pad = tops_ref.shape[0]
    c = pl.program_id(1)
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    @pl.when(c == 0)
    def _init():
        prev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG_INF))
        prev2_ref[...] = jnp.full((N, BT), NEG_INF, jnp.int32)
        ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
        cap_ref[...] = jnp.where(
            (k_corner == 0) & (j_iota == 0), jnp.int32(0), jnp.int32(NEG_INF)
        )

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG_INF, jnp.int32)

    def step(t, _):
        kk = c * ARROW_CHUNK + t

        @pl.when(kk >= 1)
        def _():
            prev = prev_ref[...]
            prev2 = prev2_ref[...]

            new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
            ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
            ch_ref[...] = ch_top
            sub = jnp.where(ch_top == side_ch, m, -kmis)

            prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
            prev2_sh = jnp.concatenate([neg_row, prev2[:-1, :]], axis=0)

            cand_d = prev2_sh + sub
            cand_u = prev_sh - d
            cand_l = prev - d
            score = jnp.maximum(jnp.maximum(cand_d, cand_u), cand_l)
            # arrow bits assembled in int32 (uint8 vector shifts don't
            # legalize on TPU), narrowed on store
            arrows = (
                (cand_d == score).astype(jnp.int32)
                + (cand_l == score).astype(jnp.int32) * 2
                + (cand_u == score).astype(jnp.int32) * 4
            )
            # interior cells have 1 <= j <= kk-1 (i = kk-j >= 1)
            interior = (j_iota >= 1) & (j_iota < kk)
            arrows = jnp.where(interior, arrows, 0)

            on_top_row = j_iota == 0  # j == 0: LEFT (computation.c:104-110)
            on_left_col = j_iota == kk  # i == 0: UP (computation.c:114-120)
            score = jnp.where(on_top_row | on_left_col, -kk * d, score)
            arrows = jnp.where(on_top_row, 2, arrows)
            arrows = jnp.where(on_left_col, 4, arrows)

            arrows_ref[pl.ds(t, 1), :, :] = arrows.astype(jnp.uint8)[None]

            hit = (k_corner == kk) & (j_iota == len2)
            cap_ref[...] = jnp.where(hit, score, cap_ref[...])

            prev2_ref[...] = prev
            prev_ref[...] = score

        @pl.when(kk == 0)
        def _():
            arrows_ref[pl.ds(t, 1), :, :] = jnp.zeros((1, N, BT), jnp.uint8)

        return 0

    jax.lax.fori_loop(0, ARROW_CHUNK, step, 0)
    score_ref[...] = jnp.max(cap_ref[...], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def fill_arrows_pallas_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False, block_pairs: int = LANES,
):
    """Batched fill emitting diagonal-major packed arrows + scores.

    Args:
      tops: int32[B, A]; sides: int32[B, Bs]; lens1/lens2: int32[B].
    Returns:
      (arrows uint8[K_pad, N, B], scores int32[B]) — cell (j, i) of pair
      b lives at ``arrows[i + j, j, b]``; rows beyond diagonal
      ``lens1[b] + lens2[b]`` are unspecified.  ``N = Bs+1`` rounded to a
      32-sublane multiple; ``K_pad >= A + Bs + 1``.
    """
    nb, A = tops.shape
    _, Bs = sides.shape

    N = _round_up(Bs + 1, 32)  # uint8 slab sublane tile
    A_pad = _round_up(max(A, 1), 8)
    BT = block_pairs
    nb_pad = _round_up(max(nb, 1), BT)
    K_true = A_pad + (N - 1)
    K_pad = _round_up(K_true + 1, ARROW_CHUNK)

    tops = jnp.pad(
        tops, ((0, nb_pad - nb), (0, A_pad - A)), constant_values=PAD_TOP
    )
    sides = jnp.pad(
        sides, ((0, nb_pad - nb), (0, N - 1 - Bs)), constant_values=PAD_SIDE
    )
    lens1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nb_pad - nb))
    lens2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nb_pad - nb))

    sides_sh = jnp.concatenate(
        [jnp.full((nb_pad, 1), -3, jnp.int32), sides.astype(jnp.int32)], axis=1
    ).T
    tops_t = tops.astype(jnp.int32).T
    lens = jnp.stack([lens1, lens2], axis=0)
    mkd = jnp.array([[m, k, d]], jnp.int32)

    grid = (nb_pad // BT, K_pad // ARROW_CHUNK)
    arrows, scores = pl.pallas_call(
        _arrows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K_pad, N, nb_pad), jnp.uint8),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (A_pad, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((N, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (ARROW_CHUNK, N, BT),
                    lambda b, c: (c, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((N, BT), jnp.int32),
                pltpu.VMEM((N, BT), jnp.int32),
                pltpu.VMEM((N, BT), jnp.int32),
                pltpu.VMEM((N, BT), jnp.int32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return arrows[:, :, :nb], scores[0, :nb]
