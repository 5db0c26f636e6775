"""Pallas TPU wavefront fill kernels.

The production fill for batched pairs.  Where the reference parallelizes
one pair across pthreads with per-cell mutexes (needleman-wunsch.c:444-475),
this kernel parallelizes across *pairs* — the batch dimension sits in the
128 vector lanes, the anti-diagonal sits in sublanes — and sequences the
wavefront with a plain ``fori_loop``: the dependency order is the loop
order, so there is nothing to lock.

Memory behavior (the whole point of the design):

* the rolling diagonals (prev, and prev2 pre-shifted) live in VMEM
  scratch — scores never touch HBM during the fill;
* the encoded sequences are loaded once per batch block into VMEM;
* for score-only fills (reference ``-q`` mode) the only HBM write is the
  final ``(1, BT)`` score row per block; arrow fills stream 4 diagonals
  per int32 word as tile-aligned slabs.

Layout per batch block (BT = 128 pairs wide):

* ``sides_sh``: int32[N, BT] — side char per row j (row 0 = sentinel);
* ``tops_t``: int32[A_pad, BT] — row i = top[i]; the rolling top-char
  register needs one single-row dynamic slice per step (char top[kk-1]
  enters at row 0 and shifts down);
* per step: one compare+select (substitution), two adds, two maxes, two
  sublane shifts; the true-corner score is captured by a masked select
  once the wavefront reaches ``min(len1+len2)`` (see _scores_kernel's
  docstring for the hot-loop economies).

Kernels here: score-only, packed arrows (opt. fused counts), fused
score+count (no arrows), and count-from-stored-arrows.
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

# int32 is the narrowest workable score dtype on current hardware: v5e
# Mosaic lowers int16 add/select/eq but has NO int16 max/min/ordered
# compares ("Target does not support this comparison", probed 2026-08),
# and the NW recurrence is add+max.  Revisit if a later generation gains
# packed 16-bit compares — halving vreg traffic would ~2x this kernel.


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def prep_batch(tops, sides, lens1, lens2, block_pairs: int = LANES):
    """Shared wrapper plumbing for the batch-in-lanes kernels.

    Pads the side bucket so N = Bs+1 is a sublane multiple, the top
    bucket to a sublane multiple, and the batch to a lane multiple
    (extra lanes are dummy pairs of length 0); transposes to the
    kernel layouts.

    Returns (tops_t int32[A_pad, nb_pad] — row i = top[i],
             sides_sh int32[N, nb_pad] — row j = side[j-1], row 0 sentinel,
             lens int32[2, nb_pad], min_corner scalar, dims (nb, nb_pad,
             A_pad, N)).
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    N = _round_up(Bs + 1, 8)
    A_pad = _round_up(max(A, 1), 8)
    BT = block_pairs
    nb_pad = _round_up(max(nb, 1), BT)

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
    # no corner can be hit before diagonal min(len1+len2) over real pairs
    min_corner = (
        jnp.min(lens[0, :nb] + lens[1, :nb]) if nb else jnp.int32(0)
    )
    return tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N)



def _scores_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, out_ref, prev_ref, prev2sh_ref,
    ch_ref, cap_ref
):
    """One grid step = one block of BT pairs, full wavefront in VMEM.

    The rolling state — the previous diagonal, the *pre-shifted*
    previous-previous diagonal, the top-character register, and the
    captured corner scores — lives in VMEM scratch; each step is pure
    vector ops.

    Three hot-loop economies over the naive formulation:

    * **Natural boundaries.** Row 0 (j == 0) needs score ``-kk*d``
      (computation.c:104-110) — but ``cand_left = prev[0] - d`` already
      produces exactly that by induction, because the shifted-in rows are
      ``NEG_INF`` and decay far below any reachable score.  Likewise the
      left column (j == kk) falls out of ``cand_up``.  No boundary
      select, no ``-kk*d`` broadcast.
    * **Carried shift.** ``shift(prev2)`` at step kk equals
      ``shift(prev)`` at step kk-1, so the kernel stores the shifted
      version and saves one sublane-shift per step.
    * **Gated capture.** No pair's corner can be hit before diagonal
      ``min(len1+len2)``; the capture compare/select runs only from
      there (``mkd_ref[0, 3]``).

    The top character needed at (diag kk, row j) is top[kk-1-j]; between
    consecutive diagonals this is a shift-down-one-row with top[kk-1]
    entering at row 0 — a rolling register fed by a single-row dynamic
    slice, instead of re-slicing N rows per step.

    Refs:
      mkd_ref:   SMEM (1, 4) int32 — m, k, d, min_corner
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
    min_corner = mkd_ref[0, 3]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]  # (1, BT)
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2  # (1, BT)

    # diagonal 0: cell (0,0) = 0, everything else outside the table
    prev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG_INF))
    prev2sh_ref[...] = jnp.full((N, BT), NEG_INF, jnp.int32)
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

        # roll the top-char register: row j now needs top[kk-1-j]
        new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
        ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
        ch_ref[...] = ch_top
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
        # max-then-subtract: one -d add instead of two
        score = jnp.maximum(
            prev2sh_ref[...] + sub, jnp.maximum(prev_sh, prev) - d
        )

        prev2sh_ref[...] = prev_sh
        prev_ref[...] = score

        # capture the true-corner score as the wavefront crosses it
        @pl.when(kk >= min_corner)
        def _():
            hit = (k_corner == kk) & (j_iota == len2)  # <=1 hit/lane
            cap_ref[...] = jnp.where(hit, score, cap_ref[...])

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
    tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    mkd = jnp.concatenate(
        [jnp.array([m, k, d], jnp.int32), min_corner[None]]
    )[None]

    grid = (nb_pad // BT,)
    out = pl.pallas_call(
        _scores_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((N, BT), jnp.int32),  # prev diagonal
                pltpu.VMEM((N, BT), jnp.int32),  # shift(prev2) diagonal
                pltpu.VMEM((N, BT), jnp.int32),  # rolling top chars
                pltpu.VMEM((N, BT), jnp.int32),  # captured corner scores
            ],
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return out[0, :nb]


# ---------------------------------------------------------------------------
# Fused score + solution-count kernel (batched `-q -s` summaries)
# ---------------------------------------------------------------------------
#
# The optimal-alignment count is itself a wavefront DP (pathcount.py);
# carrying the count diagonals next to the score diagonals answers
# ``align_batch(count=True)`` without materializing any arrows at all.
# Count arithmetic is int32 wraparound — bit-identical to the
# reference's unsigned solution counter (computation.h:65).


def _scores_counts_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, out_ref, cout_ref,
    prev_ref, prev2sh_ref, ch_ref, cap_ref, cprev_ref, cprev2sh_ref, ccap_ref
):
    """Like _scores_kernel plus count diagonals (see the count
    recurrence notes in fill_pallas_single._make_score_count_kernel:
    natural boundaries hold for counts too)."""
    N, BT = sides_ref.shape
    A_pad = tops_ref.shape[0]
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]
    min_corner = mkd_ref[0, 3]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    prev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG_INF))
    prev2sh_ref[...] = jnp.full((N, BT), NEG_INF, jnp.int32)
    cap_ref[...] = jnp.where(
        (k_corner == 0) & (j_iota == 0), jnp.int32(0), jnp.int32(NEG_INF)
    )
    ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
    cprev_ref[...] = jnp.where(j_iota == 0, jnp.int32(1), jnp.int32(0))
    cprev2sh_ref[...] = jnp.zeros((N, BT), jnp.int32)
    ccap_ref[...] = jnp.where(
        (k_corner == 0) & (j_iota == 0), jnp.int32(1), jnp.int32(0)
    )

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG_INF, jnp.int32)
    zero_row = jnp.zeros((1, BT), jnp.int32)

    def body(kk, _):
        prev = prev_ref[...]
        cprev = cprev_ref[...]

        new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
        ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
        ch_ref[...] = ch_top
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
        cand_d = prev2sh_ref[...] + sub
        score = jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d)
        prev2sh_ref[...] = prev_sh
        prev_ref[...] = score

        cprev_sh = jnp.concatenate([zero_row, cprev[:-1, :]], axis=0)
        score_d = score + d
        cnt = (
            jnp.where(cand_d == score, cprev2sh_ref[...], 0)
            + jnp.where(prev == score_d, cprev, 0)
            + jnp.where(prev_sh == score_d, cprev_sh, 0)
        )
        cprev2sh_ref[...] = cprev_sh
        cprev_ref[...] = cnt

        @pl.when(kk >= min_corner)
        def _():
            hit = (k_corner == kk) & (j_iota == len2)
            cap_ref[...] = jnp.where(hit, score, cap_ref[...])
            ccap_ref[...] = jnp.where(hit, cnt, ccap_ref[...])

        return 0

    K = (A_pad - 1) + (N - 1)
    jax.lax.fori_loop(1, K + 1, body, 0)
    out_ref[...] = jnp.max(cap_ref[...], axis=0, keepdims=True)
    # each lane captured at exactly row len2; sum-select that row
    cout_ref[...] = jnp.sum(
        jnp.where(j_iota == len2, ccap_ref[...], 0), axis=0, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def fill_scores_counts_pallas_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False, block_pairs: int = LANES,
):
    """(scores int32[B], counts uint32[B]) with no arrow materialization.

    The batched equivalent of the reference's ``-q -s`` summary path:
    one fused wavefront carrying score + solution-count diagonals.
    """
    tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    mkd = jnp.concatenate(
        [jnp.array([m, k, d], jnp.int32), min_corner[None]]
    )[None]

    scores, counts = pl.pallas_call(
        _scores_counts_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * 7,
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return scores[0, :nb], counts[0, :nb].astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Arrows-emitting kernel (traceback batches)
# ---------------------------------------------------------------------------
#
# Same batch-in-lanes layout as the score kernel (batch on the 128 lanes,
# anti-diagonal on sublanes); the grid gains an inner dimension that
# streams arrow slabs to HBM while the rolling state persists in VMEM
# scratch (TPU grid execution is sequential, so scratch carries across
# the c dimension of one batch block).
#
# Arrow bit semantics match the reference's walk-table flags
# (needleman-wunsch.c:485-503): bit0 diag, bit1 left, bit2 up.  Four
# consecutive diagonals are packed per int32 word — diagonal kk of cell
# (j, i=kk-j) is byte ``kk & 3`` of ``packed[kk >> 2, j, b]`` — so every
# HBM store is a tile-aligned int32 slab instead of a single-sublane
# uint8 write (which costs a masked relayout per step).  Cells outside
# the table rhombus (j > kk) hold unspecified garbage; no consumer reads
# them (pathcount flows counts only along in-table arrows, the walkers
# only visit in-table cells).
#
# VMEM bounds this kernel to side lengths of ~2k (state + slab must fit);
# longer pairs use the fold-layout kernel (fill_pallas_single) or the
# lax.scan fill, and score-only fills the sequence-sharded wavefront
# (parallel/wavefront.py).

def _arrow_chunk_for(N: int, BT: int, extra_scratch: int = 0) -> int:
    """Diagonals per grid step (multiple of 4 = packed int32 sublanes).

    Bigger chunks amortize grid-step overhead; the double-buffered out
    slab must still fit VMEM next to the 4 scratch diagonals, the
    double-buffered inputs and ~3 units of vector-stack temporaries
    (calibrated against Mosaic's scoped-vmem accounting at N=2008).
    """
    unit = N * BT * 4  # one (N, BT) int32 buffer
    budget_units = int(0.85 * 16 * 1024 * 1024 / unit)
    # each extra scratch diagonal brings ~2 more vector-stack temps
    base = 12 + 4 * extra_scratch
    for chunk in (64, 32, 16, 8):
        if base + chunk <= budget_units:
            return chunk
    return 4


def _make_arrows_kernel(with_counts: bool):
    """Build the arrows kernel, optionally carrying solution-count
    diagonals so traceback+count batches need a single fill pass."""

    def _arrows_kernel(mkd_ref, tops_ref, sides_ref, lens_ref, *refs):
        if with_counts:
            (packed_ref, score_ref, count_ref,
             prev_ref, prev2sh_ref, ch_ref, pack_ref,
             cprev_ref, cprev2sh_ref) = refs
        else:
            (packed_ref, score_ref,
             prev_ref, prev2sh_ref, ch_ref, pack_ref) = refs
        _arrows_body(
            with_counts, mkd_ref, tops_ref, sides_ref, lens_ref,
            packed_ref, score_ref,
            count_ref if with_counts else None,
            prev_ref, prev2sh_ref, ch_ref, pack_ref,
            cprev_ref if with_counts else None,
            cprev2sh_ref if with_counts else None,
        )

    return _arrows_kernel


def _arrows_body(
    with_counts, mkd_ref, tops_ref, sides_ref, lens_ref, packed_ref,
    score_ref, count_ref, prev_ref, prev2sh_ref, ch_ref, pack_ref,
    cprev_ref, cprev2sh_ref
):
    """Grid (batch_blocks, K_pad // ARROW_CHUNK).

    Same hot-loop economies as :func:`_scores_kernel` (natural
    boundaries, carried shift, gated capture) — boundary arrows also
    fall out naturally: on row j == 0 only ``cand_left`` survives, so
    the bits come out as exactly LEFT (computation.c:104-110), and on
    the j == kk column as exactly UP.

    Refs:
      mkd_ref:    SMEM (1, 4) int32 — m, k, d, min_corner
      tops_ref:   VMEM (A_pad, BT) int32 — top chars, row i = top[i]
      sides_ref:  VMEM (N, BT) int32 — side char per row j (row 0 sentinel)
      lens_ref:   VMEM (2, BT) int32 — len1, len2 per pair
      packed_ref: VMEM (ARROW_CHUNK//4, N, BT) int32 out slab
      score_ref:  VMEM (1, BT) int32 out — per-pair corner scores
        (c-invariant block: doubles as the capture accumulator)
      prev/prev2sh/ch/pack: VMEM (N, BT) int32 scratch, persistent
        across the c grid dimension
    """
    _, N, BT = packed_ref.shape
    ARROW_CHUNK = packed_ref.shape[0] * 4
    A_pad = tops_ref.shape[0]
    c = pl.program_id(1)
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]
    min_corner = mkd_ref[0, 3]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    @pl.when(c == 0)
    def _init():
        prev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG_INF))
        prev2sh_ref[...] = jnp.full((N, BT), NEG_INF, jnp.int32)
        ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
        # corner scores accumulate directly into the (1, BT) output (its
        # block index is c-invariant, so it persists across chunks);
        # len-0+0 pairs have their corner at diagonal 0 = score 0
        score_ref[...] = jnp.where(
            k_corner == 0, jnp.int32(0), jnp.int32(NEG_INF)
        )
        if with_counts:
            cprev_ref[...] = jnp.where(j_iota == 0, jnp.int32(1), jnp.int32(0))
            cprev2sh_ref[...] = jnp.zeros((N, BT), jnp.int32)
            count_ref[...] = jnp.where(k_corner == 0, jnp.int32(1), jnp.int32(0))

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG_INF, jnp.int32)
    zero_row = jnp.zeros((1, BT), jnp.int32)

    def step(t, _):
        kk = c * ARROW_CHUNK + t

        @pl.when(kk >= 1)
        def _():
            prev = prev_ref[...]

            new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
            ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
            ch_ref[...] = ch_top
            sub = jnp.where(ch_top == side_ch, m, -kmis)

            prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
            cand_d = prev2sh_ref[...] + sub
            score = jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d)

            prev2sh_ref[...] = prev_sh
            prev_ref[...] = score

            # arrow bits: left/up candidates aren't materialized (fused
            # max-then-subtract), so compare against score + d instead
            score_d = score + d
            b_diag = cand_d == score
            b_left = prev == score_d
            b_up = prev_sh == score_d
            arrows = (
                b_diag.astype(jnp.int32)
                + b_left.astype(jnp.int32) * 2
                + b_up.astype(jnp.int32) * 4
            )
            # pack byte kk & 3 of the current word
            r = jnp.bitwise_and(t, 3)
            word = arrows << (r * 8)

            @pl.when(r == 0)
            def _():
                pack_ref[...] = word

            @pl.when(r != 0)
            def _():
                pack_ref[...] = pack_ref[...] | word

            @pl.when(r == 3)
            def _():
                packed_ref[pl.ds(t // 4, 1), :, :] = pack_ref[...][None]

            if with_counts:
                cprev = cprev_ref[...]
                cprev_sh = jnp.concatenate([zero_row, cprev[:-1, :]], axis=0)
                cnt = (
                    jnp.where(b_diag, cprev2sh_ref[...], 0)
                    + jnp.where(b_left, cprev, 0)
                    + jnp.where(b_up, cprev_sh, 0)
                )
                cprev2sh_ref[...] = cprev_sh
                cprev_ref[...] = cnt

            @pl.when(kk >= min_corner)
            def _():
                hit = (k_corner == kk) & (j_iota == len2)
                hit_score = jnp.max(
                    jnp.where(hit, score, NEG_INF), axis=0, keepdims=True
                )
                score_ref[...] = jnp.maximum(score_ref[...], hit_score)
                if with_counts:
                    count_ref[...] = count_ref[...] + jnp.sum(
                        jnp.where(hit, cprev_ref[...], 0),
                        axis=0, keepdims=True,
                    )

        @pl.when(kk == 0)
        def _():
            pack_ref[...] = jnp.zeros((N, BT), jnp.int32)

        return 0

    jax.lax.fori_loop(0, ARROW_CHUNK, step, 0)


def unpack_arrows32(packed):
    """int32[K4, N, ...] packed arrows -> uint8[K4*4, N, ...].

    Byte r of word q is diagonal ``4*q + r`` (little-endian packing in
    :func:`_arrows_kernel`).
    """
    u8 = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (K4, N, ..., 4)
    return jnp.moveaxis(u8, -1, 1).reshape(
        (packed.shape[0] * 4,) + packed.shape[1:]
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_pairs", "packed", "with_counts")
)
def fill_arrows_pallas_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False, block_pairs: int = LANES,
    packed: bool = False, with_counts: bool = False,
):
    """Batched fill emitting diagonal-major packed arrows + scores.

    Args:
      tops: int32[B, A]; sides: int32[B, Bs]; lens1/lens2: int32[B].
      packed: return the 4-diagonals-per-int32 layout without unpacking.
      with_counts: also carry solution-count diagonals and return
        per-pair counts (uint32, reference-wrapping) as a third output —
        one fused pass instead of fill + count_paths.
    Returns:
      ``packed=False``: (arrows uint8[K_pad, N, B], scores int32[B]) —
      cell (j, i) of pair b lives at ``arrows[i + j, j, b]``.
      ``packed=True``: (words int32[K_pad//4, N, B], scores) — the same
      cell is byte ``(i+j) & 3`` of ``words[(i+j) >> 2, j, b]``.
      Cells outside the table rhombus are unspecified.  ``N = Bs+1``
      rounded to a sublane multiple; ``K_pad >= A + Bs + 1``.
    """
    tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    ARROW_CHUNK = _arrow_chunk_for(N, BT, extra_scratch=1 if with_counts else 0)
    K_pad = _round_up(A_pad + (N - 1) + 1, ARROW_CHUNK)
    mkd = jnp.concatenate(
        [jnp.array([m, k, d], jnp.int32), min_corner[None]]
    )[None]

    grid = (nb_pad // BT, K_pad // ARROW_CHUNK)
    out_shapes = [
        jax.ShapeDtypeStruct((K_pad // 4, N, nb_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
    ]
    n_scratch = 4
    if with_counts:
        out_shapes.append(jax.ShapeDtypeStruct((1, nb_pad), jnp.int32))
        n_scratch = 6
    outs = pl.pallas_call(
        _make_arrows_kernel(with_counts),
        out_shape=tuple(out_shapes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 4), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (A_pad, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((N, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                [
                    pl.BlockSpec(
                        (ARROW_CHUNK // 4, N, BT),
                        lambda b, c: (c, 0, b),
                        memory_space=pltpu.VMEM,
                    )
                ]
                + [
                    pl.BlockSpec(
                        (1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM
                    )
                ]
                * (len(out_shapes) - 1)
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * n_scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    words, scores = outs[0], outs[1]
    arrows = words[:, :, :nb] if packed else unpack_arrows32(words)[:, :, :nb]
    if with_counts:
        return arrows, scores[0, :nb], outs[2][0, :nb].astype(jnp.uint32)
    return arrows, scores[0, :nb]


# ---------------------------------------------------------------------------
# Count-from-stored-arrows kernel (two-pass batches beyond the fused gate)
# ---------------------------------------------------------------------------
#
# When the fused with_counts variant doesn't fit VMEM (sides > ~1k), the
# counts come from a second pass over the packed arrow slabs.  The XLA
# scan version (pathcount._count_paths_packed vmapped) costs ~2x the
# fill itself; this kernel streams the slabs back through VMEM with the
# same batch-in-lanes layout and runs the count recurrence at fill
# speed.


def _count_kernel(
    lens_ref, words_ref, count_ref, cprev_ref, cprev2sh_ref
):
    """Grid (batch_blocks, K_pad // chunk); words block (chunk//4, N, BT).

    count_ref: (1, BT) int32 out, c-invariant (capture accumulator).
    """
    W4, N, BT = words_ref.shape
    c = pl.program_id(1)

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    @pl.when(c == 0)
    def _init():
        cprev_ref[...] = jnp.zeros((N, BT), jnp.int32)
        cprev2sh_ref[...] = jnp.zeros((N, BT), jnp.int32)
        count_ref[...] = jnp.where(k_corner == 0, jnp.int32(1), jnp.int32(0))

    zero_row = jnp.zeros((1, BT), jnp.int32)
    seed = jnp.where(j_iota == 0, jnp.int32(1), jnp.int32(0))

    def word_step(q, _):
        w = words_ref[pl.ds(q, 1), :, :][0]
        for r in range(4):  # static unroll: 4 diagonals per word read
            kk = (c * W4 + q) * 4 + r
            arr = (w >> (r * 8)) & 0xFF
            cprev = cprev_ref[...]
            cprev_sh = jnp.concatenate([zero_row, cprev[:-1, :]], axis=0)
            cnt = (
                jnp.where((arr & 1) != 0, cprev2sh_ref[...], 0)
                + jnp.where((arr & 2) != 0, cprev, 0)
                + jnp.where((arr & 4) != 0, cprev_sh, 0)
            )
            cnt = jnp.where(kk == 0, seed, cnt)
            cprev2sh_ref[...] = cprev_sh
            cprev_ref[...] = cnt

            @pl.when(kk >= 1)
            def _():
                # capture at each pair's corner diagonal
                hit = (k_corner == kk) & (j_iota == len2)
                count_ref[...] = count_ref[...] + jnp.sum(
                    jnp.where(hit, cnt, 0), axis=0, keepdims=True
                )

        return 0

    jax.lax.fori_loop(0, W4, word_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def count_packed_pallas_batch(
    words, lens1, lens2,
    interpret: bool = False, block_pairs: int = LANES,
):
    """uint32[B] solution counts from packed arrow words int32[K4, N, B].

    ``words`` as produced by :func:`fill_arrows_pallas_batch`
    (packed=True); B must already be a multiple of ``block_pairs``
    (it is, coming straight from the fill).
    """
    K4, N, nb = words.shape
    BT = block_pairs
    nb_pad = _round_up(max(nb, 1), BT)
    if nb_pad != nb:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, nb_pad - nb)))
    lens1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nb_pad - nb))
    lens2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nb_pad - nb))
    lens = jnp.stack([lens1, lens2], axis=0)

    # stream slabs at the same chunking the fill used (VMEM: in slab
    # double-buffered + 2 scratch + temps)
    chunk = _arrow_chunk_for(N, BT)
    K_pad4 = _round_up(K4, chunk // 4)
    if K_pad4 != K4:
        # beyond-corner words are never captured; zero-pad is safe
        words = jnp.pad(words, ((0, K_pad4 - K4), (0, 0), (0, 0)))

    counts = pl.pallas_call(
        _count_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT, K_pad4 // (chunk // 4)),
            in_specs=[
                pl.BlockSpec((2, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (chunk // 4, N, BT),
                    lambda b, c: (c, 0, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((N, BT), jnp.int32),  # prev count diagonal
                pltpu.VMEM((N, BT), jnp.int32),  # shift(prev2) count
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, words)
    return counts[0, :nb].astype(jnp.uint32)
