"""Banded (row-tiled) Pallas wavefront fill for long-side batches.

SURVEY §5.7's 2-D block-wavefront tiling, realized on-chip: the DP
matrix's *row* dimension (the side string) is cut into bands of ``RB``
rows; each band runs the same batch-in-lanes wavefront as
:mod:`nw_tpu.ops.fill_pallas` (batch in the 128 lanes, band-local
anti-diagonal in sublanes) with rolling ``(RB, 128)`` state, and bands
hand off through their **boundary row** — the reference's cross-thread
dependency (the condvar wait on the left neighbor,
needleman-wunsch.c:444-475) becomes a streamed HBM row between
sequential band sweeps.  This lifts the ~2k side-length VMEM bound of
the flat kernels to arbitrary side lengths while keeping the batch in
lanes.

Two measured effects set the geometry (v5e, 128 x 10kb pairs):

* **Rhombus slot overhead**: a band sweeps ``(A+RB) x RB`` slots for
  its ``A x RB`` cells — overhead ``1 + RB/A`` vs the flat kernel's
  2.04x at A=B.  Smaller bands waste fewer slots.
* **Register residency**: per-slot throughput collapses ~2x once the
  rolling state outgrows the vector register file (the flat kernel
  drops from 351 to ~180 Gslots/s between side 144 and 512, measured).
  The hot loop is therefore **unrolled**: one iteration advances
  ``UNROLL`` diagonals with the three state registers loaded once and
  stored once, so intermediate diagonals never touch VMEM.

The sweet spot is RB ~= 96 rows (12 vregs/buffer) with UNROLL >= 16:
~325 GCUPS score-only at 128 x 10kb — 2x the flat kernel's 161 at
150 bp, ~30,000x the reference C fill, ~84% of the int32 VPU roofline
(PERF.md).

Band-local coordinates and the handoff:

* band ``r`` owns global rows ``j in [r*RB, (r+1)*RB)``; local row
  ``jj = j - r*RB``; local step ``t`` computes cells ``(jj, i = t-jj)``
  (global anti-diagonal ``kk = t + r*RB``).
* the *up* neighbor of local row 0 is the previous band's last row
  ``bnd[i]``, produced by the parent at ITS step ``u = i + RB - 1``.
  The boundary buffer is indexed **by producer step** so the writer's
  stores stay 8-row aligned (a small staging register flushes every 8
  steps); the reader needs ``bnd[u = t + RB - 1]`` — served from a
  per-chunk contiguous VMEM window built by two bulk copies
  (``lag0 = (RB-1)//C`` whole blocks of lag plus an ``off``-row phase).
* the *diag* neighbor of row 0 is carried automatically by the
  pre-shifted prev2 register (the "carried shift" economy of the flat
  kernels).
* band 0 has no parent; its boundary input is a NEG_INF dummy, and the
  DP seed cell (0,0) = 0 is patched into the in-register state right
  after the t = 0 substep (one predicated select per unroll group) —
  rows/columns 0 then fall out of the NEG_INF natural-boundary decay
  exactly as in fill_pallas (computation.c:96-120).

Parameter envelope (same as the flat Pallas kernels): natural
boundaries rely on NEG_INF = -2^30 decaying strictly below every real
score, so |m|, |k|, |d| (and true scores) must stay below ~2^30; the
CLI's exact-wraparound paths route through the explicitly-masked scan
fill instead.

Unwritten tails of the boundary buffers (beyond the producer's last
step) inject garbage only into columns ``i > A`` — out-of-table cells
whose values flow strictly down-right and never reach a true-rectangle
cell (the same argument that makes pad characters safe, ops/encode.py).

One Mosaic kernel serves every band: the band index, capture gate and
scoring params ride a scalar-prefetch vector, so the band sweep is a
single ``lax.scan`` over one compiled kernel.

Reproduces: the fill loop at needleman-wunsch.c:418-626, scaled to
lengths where the reference's 136 B/cell tables cannot exist.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP

NEG_INF = -(2**30)
LANES = 128
BIG = 2**30

# measured sweet spot (see module docstring); RB shrinks to the table
# for short sides, UNROLL divides C
DEFAULT_BAND_ROWS = 96
DEFAULT_CHUNK = 480
DEFAULT_UNROLL = 24


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_banded_scores_kernel(RB: int, C: int, off: int, unroll: int):
    """Score-only banded kernel; grid (batch_blocks, T_pad // C).

    Refs:
      s_ref:      scalar prefetch int32[8] — m, k, d, band r, t_cap
                  (first band-local step any pair's corner can be hit),
                  j0 = r*RB, first-band flag, (1 spare)
      tops_ref:   VMEM (C, BT) int32 — tops_sh[t] = top[t-1] chunk
      sides_ref:  VMEM (RB, BT) int32 — this band's side chars
                  (sides_sh[j] = side[j-1]; row 0 of band 0 = sentinel)
      lens_ref:   VMEM (2, BT) int32 — len1, len2 per pair
      bnda/bndb:  VMEM (C, BT) int32 — parent boundary blocks c+lag0,
                  c+lag0+1 (indexed by producer step u)
      score_ref:  VMEM (1, BT) int32 out — corner capture accumulator
                  (c-invariant block)
      bndout_ref: VMEM (C, BT) int32 out — this band's last row, by step
      prev/prev2sh/ch: VMEM (RB, BT) scratch (persist across c)
      bscr_ref:   VMEM (C, BT) scratch — contiguous boundary window
      stage_ref:  VMEM (8, BT) scratch — boundary-out staging
    """

    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref, bnda_ref, bndb_ref,
        score_ref, bndout_ref, prev_ref, prev2sh_ref, ch_ref, bscr_ref,
        stage_ref,
    ):
        BT = lens_ref.shape[1]
        c = pl.program_id(1)
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        tcap = s_ref[4]
        j0 = s_ref[5]
        first = s_ref[6]

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, BT), 0)
        len1 = lens_ref[0:1, :]
        len2 = lens_ref[1:2, :]
        t_corner = len1 + len2 - j0  # corner diag in band-local steps
        tgt_row = len2 - j0

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.full((RB, BT), NEG_INF, jnp.int32)
            prev2sh_ref[...] = jnp.full((RB, BT), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((RB, BT), -4, jnp.int32)
            # len-0+0 pairs: their corner IS the band-0 seed cell (0,0)
            score_ref[...] = jnp.where(
                (first == 1) & (len1 + len2 == 0),
                jnp.int32(0), jnp.int32(NEG_INF),
            )

        # contiguous parent-boundary window for this chunk:
        # bscr[tl] = bnd[u = c*C + tl + RB - 1]
        bscr_ref[0 : C - off, :] = bnda_ref[off:C, :]
        if off:
            bscr_ref[C - off : C, :] = bndb_ref[0:off, :]

        side_ch = sides_ref[...]

        def substep(t, tl, prev, prev2sh, ch):
            new_top = tops_ref[pl.ds(tl, 1), :]
            ch = jnp.concatenate([new_top, ch[:-1, :]], axis=0)
            sub = jnp.where(ch == side_ch, m, -kmis)

            inj = bscr_ref[pl.ds(tl, 1), :]
            prev_sh = jnp.concatenate([inj, prev[:-1, :]], axis=0)
            score = jnp.maximum(prev2sh + sub, jnp.maximum(prev_sh, prev) - d)

            # stage this band's last row (column i = t - RB + 1);
            # 8-aligned slab flushes keep the store path cheap
            r8 = jnp.bitwise_and(tl, 7)
            stage_ref[pl.ds(r8, 1), :] = score[RB - 1 : RB, :]

            @pl.when(r8 == 7)
            def _():
                bndout_ref[pl.ds(tl - 7, 8), :] = stage_ref[...]

            @pl.when(t >= tcap)
            def _():
                hit = (t_corner == t) & (j_iota == tgt_row)
                score_ref[...] = jnp.maximum(
                    score_ref[...],
                    jnp.max(
                        jnp.where(hit, score, NEG_INF), axis=0, keepdims=True
                    ),
                )
            return score, prev_sh, ch

        def step(i, _):
            # UNROLL diagonals per iteration: state registers load once,
            # store once; intermediates stay in vregs
            tl0 = i * unroll
            prev = prev_ref[...]
            prev2sh = prev2sh_ref[...]
            ch = ch_ref[...]
            for u in range(unroll):
                tl = tl0 + u
                prev, prev2sh, ch = substep(c * C + tl, tl, prev, prev2sh, ch)
                if u == 0:
                    # band-0 DP seed: overwrite the t = 0 garbage with
                    # cell (0,0) = 0 before step t = 1 consumes it
                    seed_now = (c == 0) & (i == 0) & (first == 1)
                    prev = jnp.where(
                        seed_now & (j_iota == 0), jnp.int32(0), prev
                    )
            prev_ref[...] = prev
            prev2sh_ref[...] = prev2sh
            ch_ref[...] = ch
            return 0

        jax.lax.fori_loop(0, C // unroll, step, 0)

    return kernel


def _chunk_quantum(unroll: int) -> int:
    """Chunks must be a multiple of BOTH ``unroll`` (the fori loop runs
    ``C // unroll`` whole groups) and 8 (the boundary-out staging slab
    flushes only at ``tl % 8 == 7``; a chunk that isn't 8-aligned would
    silently never write its last ``C % 8`` boundary rows — the next
    band would read garbage)."""
    import math

    return unroll * 8 // math.gcd(unroll, 8)


def _geometry(A: int, N: int, band_rows: int, chunk: int, unroll: int):
    """Clamp the (RB, C, UNROLL) geometry to the table."""
    RB = min(band_rows, _round_up(N, 8))
    nbands = -(-N // RB)
    C = _round_up(chunk, _chunk_quantum(unroll))
    T = A + RB  # steps t in [0, T): last row's col A lands at t = A+RB-1
    T_pad = _round_up(T, C)
    lag0 = (RB - 1) // C
    off = (RB - 1) - lag0 * C
    U_pad = T_pad + (lag0 + 2) * C  # reader blocks reach c + lag0 + 1
    return RB, nbands, C, T_pad, lag0, off, U_pad


def _prep_banded(tops, sides, lens1, lens2, BT, T_pad, N_pad):
    """Layouts: tops_sh (T_pad, nb_pad) with tops_sh[t] = top[t-1];
    sides_sh (N_pad, nb_pad) with sides_sh[j] = side[j-1]; lens (2, nb_pad)."""
    nb, A = tops.shape
    _, Bs = sides.shape
    nb_pad = _round_up(max(nb, 1), BT)

    tops_sh = jnp.full((T_pad, nb_pad), PAD_TOP, jnp.int32)
    if A:
        tops_sh = tops_sh.at[1 : A + 1, :nb].set(tops.astype(jnp.int32).T)
    tops_sh = tops_sh.at[0, :].set(-6)

    sides_sh = jnp.full((N_pad, nb_pad), PAD_SIDE, jnp.int32)
    if Bs:
        sides_sh = sides_sh.at[1 : Bs + 1, :nb].set(sides.astype(jnp.int32).T)
    sides_sh = sides_sh.at[0, :].set(-3)

    lens1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nb_pad - nb))
    lens2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nb_pad - nb))
    lens = jnp.stack([lens1, lens2], axis=0)
    return tops_sh, sides_sh, lens, nb_pad


def _band_scalars(m, k, d, r, RB, lens, nb):
    """Per-band scalar-prefetch vector [m, k, d, r, tcap, j0, first, 0].

    ``r`` may be traced (the band loop is a lax.scan)."""
    r = jnp.asarray(r, jnp.int32)
    j0 = r * RB
    l1 = lens[0, :nb]
    l2 = lens[1, :nb]
    in_band = (l2 >= j0) & (l2 < j0 + RB)
    tcap = jnp.min(jnp.where(in_band, l1 + l2 - j0, BIG))
    return jnp.stack(
        [
            jnp.asarray(m, jnp.int32),
            jnp.asarray(k, jnp.int32),
            jnp.asarray(d, jnp.int32),
            r,
            tcap.astype(jnp.int32),
            j0,
            (r == 0).astype(jnp.int32),
            jnp.int32(0),
        ]
    )


def build_scores_call(
    RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret
):
    """The compiled score-band sweep: call(s, tops_sh, sides_sh, lens,
    bnd, bnd) -> (score partial (1, nb_pad), bnd_out (U_pad, nb_pad))."""
    return pl.pallas_call(
        _make_banded_scores_kernel(RB, C, off, unroll),
        out_shape=(
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb_pad // BT, T_pad // C),
            in_specs=[
                pl.BlockSpec(
                    (C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RB, BT), lambda b, c, s: (s[3], b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (C, BT), lambda b, c, s: (c + lag0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (C, BT), lambda b, c, s: (c + lag0 + 1, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((RB, BT), jnp.int32),  # prev diagonal
                pltpu.VMEM((RB, BT), jnp.int32),  # shift(prev2) diagonal
                pltpu.VMEM((RB, BT), jnp.int32),  # rolling top chars
                pltpu.VMEM((C, BT), jnp.int32),   # boundary window
                pltpu.VMEM((8, BT), jnp.int32),   # boundary-out staging
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )


def _make_banded_arrows_kernel(
    RB: int, C: int, off: int, unroll: int, with_counts: bool,
    with_words: bool = True, pack_bits: int = 8, with_runs: bool = False,
):
    """Arrows-emitting banded kernel; grid (batch_blocks, T_pad // C).

    Same hot loop as the scores kernel plus walk-flag emission
    (needleman-wunsch.c:485-503).  Two packings:

    * ``pack_bits=8`` (default): the full 3-bit tie mask — bit0 diag,
      bit1 left, bit2 up — four band-local diagonals per int32 word
      little-endian.  Cell (j, i) of pair b is byte ``(i + j%RB) & 3``
      of ``words[j//RB, (i + j%RB) >> 2, j%RB, b]``.  Feeds counting and
      enumeration, which need every tied direction.
    * ``pack_bits=2``: only the GREEDY direction — the diag > left > up
      choice the reference DFS descends first (needleman-wunsch.c:
      305-324) — sixteen diagonals per word: cell (j, i) is bits
      ``2 * ((i + j%RB) & 15)`` of ``words[j//RB, (i+j%RB) >> 4, j%RB,
      b]`` with code 0 diag / 1 left / 2 up.  4x less word traffic and
      VMEM slab; exactly what the greedy traceback consumers read
      (they never look at tie masks).

    The pack register lives in vregs only — ``unroll`` must be a
    multiple of the pack period (32 // pack_bits) so every word
    completes inside one unrolled group.

    With ``with_counts``, solution-count diagonals ride along (their
    boundary row streams through a second bnd in/out pair), emitting the
    reference's ``-s`` solution count (int32 wraparound == the
    reference's unsigned overflow, computation.h:65) with no second pass.

    ``with_runs`` (requires ``pack_bits=8``, no counts): each byte is
    ``min(run, 63) << 2 | code`` — the greedy code plus the length of
    the maximal same-code run ENDING at this cell walking backward:
    diag runs chain through the diag predecessor (one extra shifted
    register pair, zero-injected at each band's row 0 so runs never
    cross a band), left runs through the left predecessor (same row —
    one unshifted register, no boundary).  Up steps keep run = 0.  The
    run-skip walk (banded_traceback._make_runs_walk_loop) consumes a
    whole run per gather instead of one cell, cutting the sequential
    dependent-gather chain 10-60x on near-diagonal paths; a capped or
    band-split run only shortens a jump, never corrupts it (every
    counted cell's code is DIAG/LEFT by construction).
    """
    P = 32 // pack_bits  # cells per packed int32 word
    if with_runs and (pack_bits != 8 or with_counts or not with_words):
        raise ValueError("with_runs requires pack_bits=8 words, no counts")

    def kernel(*refs):
        it = iter(refs)
        s_ref = next(it)
        tops_ref = next(it)
        sides_ref = next(it)
        lens_ref = next(it)
        bnda_ref = next(it)
        bndb_ref = next(it)
        if with_counts:
            cbnda_ref = next(it)
            cbndb_ref = next(it)
        words_ref = next(it) if with_words else None
        score_ref = next(it)
        bndout_ref = next(it)
        if with_counts:
            count_ref = next(it)
            cbndout_ref = next(it)
        prev_ref = next(it)
        prev2sh_ref = next(it)
        ch_ref = next(it)
        bscr_ref = next(it)
        stage_ref = next(it)
        if with_counts:
            cprev_ref = next(it)
            cprev2sh_ref = next(it)
            cbscr_ref = next(it)
            cstage_ref = next(it)
        if with_runs:
            vprev_ref = next(it)
            vprev2sh_ref = next(it)

        BT = lens_ref.shape[1]
        c = pl.program_id(1)
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        tcap = s_ref[4]
        j0 = s_ref[5]
        first = s_ref[6]

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, BT), 0)
        len1 = lens_ref[0:1, :]
        len2 = lens_ref[1:2, :]
        t_corner = len1 + len2 - j0
        tgt_row = len2 - j0

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.full((RB, BT), NEG_INF, jnp.int32)
            prev2sh_ref[...] = jnp.full((RB, BT), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((RB, BT), -4, jnp.int32)
            score_ref[...] = jnp.where(
                (first == 1) & (len1 + len2 == 0),
                jnp.int32(0), jnp.int32(NEG_INF),
            )
            if with_counts:
                cprev_ref[...] = jnp.zeros((RB, BT), jnp.int32)
                cprev2sh_ref[...] = jnp.zeros((RB, BT), jnp.int32)
                count_ref[...] = jnp.where(
                    (first == 1) & (len1 + len2 == 0),
                    jnp.int32(1), jnp.int32(0),
                )
            if with_runs:
                # v = 0 is the no-chain sentinel: code bits say DIAG
                # but run = 0, so a reader chains dr = 0 + 1 = 1
                vprev_ref[...] = jnp.zeros((RB, BT), jnp.int32)
                vprev2sh_ref[...] = jnp.zeros((RB, BT), jnp.int32)

        bscr_ref[0 : C - off, :] = bnda_ref[off:C, :]
        if off:
            bscr_ref[C - off : C, :] = bndb_ref[0:off, :]
        if with_counts:
            cbscr_ref[0 : C - off, :] = cbnda_ref[off:C, :]
            if off:
                cbscr_ref[C - off : C, :] = cbndb_ref[0:off, :]

        side_ch = sides_ref[...]

        def substep(t, tl, rp, st):
            prev, prev2sh, ch, cprev, cprev2sh, pack, vprev, vprev2sh = st
            new_top = tops_ref[pl.ds(tl, 1), :]
            ch = jnp.concatenate([new_top, ch[:-1, :]], axis=0)
            sub = jnp.where(ch == side_ch, m, -kmis)

            inj = bscr_ref[pl.ds(tl, 1), :]
            prev_sh = jnp.concatenate([inj, prev[:-1, :]], axis=0)
            cand_d = prev2sh + sub
            mxd = jnp.maximum(prev_sh, prev) - d
            score = jnp.maximum(cand_d, mxd)

            greedy_only = (pack_bits == 2 and not with_counts) or with_runs
            if not greedy_only:
                # walk flags: left/up candidates aren't materialized
                # (fused max-then-subtract), so compare against score+d
                score_d = score + d
                b_diag = cand_d == score
                b_left = prev == score_d
                b_up = prev_sh == score_d
            if with_words:
                # rp is static (unroll % P == 0): the pack register
                # never crosses an unrolled group
                if with_runs:
                    # greedy code + same-code run length (see docstring).
                    # The emitted byte v is its own chain carrier: the
                    # diag run chains through the DIAG predecessor's v
                    # (vprev2sh — the shifted register pair mirrors the
                    # score state exactly) when its code bits say diag;
                    # the left run through the LEFT predecessor (vprev,
                    # same row, unshifted) when its code bits say left.
                    # Zero injection at row 0 fresh-starts runs per
                    # band; packing chain+code in one register keeps
                    # the rolling state at 5 (RB, BT) buffers (3 would
                    # blow past the vector register file at RB = 96).
                    vprev_sh = jnp.concatenate(
                        [jnp.zeros((1, BT), jnp.int32), vprev[:-1, :]],
                        axis=0,
                    )
                    is_diag = cand_d >= mxd
                    is_left = jnp.logical_not(is_diag) & (prev >= prev_sh)
                    dpred = jnp.where(
                        (vprev2sh & 3) == 0, vprev2sh >> 2, 0
                    )
                    lpred = jnp.where((vprev & 3) == 1, vprev >> 2, 0)
                    run = jnp.where(
                        is_diag,
                        jnp.minimum(dpred, 62) + 1,
                        jnp.where(
                            is_left, jnp.minimum(lpred, 62) + 1, 0
                        ),
                    )
                    code = jnp.where(
                        is_diag, 0, jnp.where(is_left, 1, 2)
                    )
                    v = (run << 2) | code
                    word = v << (rp * 8)
                    vprev, vprev2sh = v, vprev_sh
                elif pack_bits == 8:
                    arrows = (
                        b_diag.astype(jnp.int32)
                        + b_left.astype(jnp.int32) * 2
                        + b_up.astype(jnp.int32) * 4
                    )
                    word = arrows << (rp * pack_bits)
                else:
                    # greedy choice only: 0 diag, 1 left, 2 up
                    # (diag > left > up, needleman-wunsch.c:305-324).
                    # The pack shift folds into the select constants —
                    # 2 fewer VPU ops per cell than encode-then-shift.
                    def _c(v):  # wrap the shifted constant to signed i32
                        return jnp.int32(((v + 2**31) % 2**32) - 2**31)

                    # ALWAYS the pre-max compares — even when the
                    # count DP has materialized the tie flags.
                    # Reusing b_diag/b_left reads flags that depend on
                    # the post-max score, lengthening the critical
                    # path; the pre-max operands issue alongside the
                    # max itself.  Measured on v5e: flag-reuse cost
                    # ~11% of config-3 e2e (575 -> ~515 pairs/s).
                    w_diag = cand_d >= mxd
                    w_left = prev >= prev_sh
                    word = jnp.where(
                        w_diag,
                        jnp.int32(0),
                        jnp.where(
                            w_left,
                            _c(1 << (rp * pack_bits)),
                            _c(2 << (rp * pack_bits)),
                        ),
                    )
                pack = word if rp == 0 else pack | word
                if rp == P - 1:
                    words_ref[pl.ds(tl // P, 1), :, :] = pack[None]

            r8 = jnp.bitwise_and(tl, 7)
            stage_ref[pl.ds(r8, 1), :] = score[RB - 1 : RB, :]

            @pl.when(r8 == 7)
            def _():
                bndout_ref[pl.ds(tl - 7, 8), :] = stage_ref[...]

            cnt = None
            if with_counts:
                cinj = cbscr_ref[pl.ds(tl, 1), :]
                cprev_sh = jnp.concatenate([cinj, cprev[:-1, :]], axis=0)
                cnt = (
                    jnp.where(b_diag, cprev2sh, 0)
                    + jnp.where(b_left, cprev, 0)
                    + jnp.where(b_up, cprev_sh, 0)
                )
                cstage_ref[pl.ds(r8, 1), :] = cnt[RB - 1 : RB, :]

                @pl.when(r8 == 7)
                def _():
                    cbndout_ref[pl.ds(tl - 7, 8), :] = cstage_ref[...]

                cprev2sh = cprev_sh

            @pl.when(t >= tcap)
            def _():
                hit = (t_corner == t) & (j_iota == tgt_row)
                score_ref[...] = jnp.maximum(
                    score_ref[...],
                    jnp.max(
                        jnp.where(hit, score, NEG_INF), axis=0, keepdims=True
                    ),
                )
                if with_counts:
                    count_ref[...] = count_ref[...] + jnp.sum(
                        jnp.where(hit, cnt, 0), axis=0, keepdims=True
                    )

            return (
                score, prev_sh, ch, cnt, cprev2sh, pack, vprev, vprev2sh,
            )

        def step(i, _):
            tl0 = i * unroll
            st = (
                prev_ref[...], prev2sh_ref[...], ch_ref[...],
                cprev_ref[...] if with_counts else None,
                cprev2sh_ref[...] if with_counts else None,
                None,  # pack register: completes within each group
                vprev_ref[...] if with_runs else None,
                vprev2sh_ref[...] if with_runs else None,
            )
            for u in range(unroll):
                tl = tl0 + u
                st = substep(c * C + tl, tl, u % P, st)
                if u == 0:
                    seed_now = (c == 0) & (i == 0) & (first == 1)
                    seed_mask = seed_now & (j_iota == 0)
                    st = (
                        jnp.where(seed_mask, jnp.int32(0), st[0]),
                    ) + st[1:]
                    if with_counts:
                        st = st[:3] + (
                            jnp.where(seed_mask, jnp.int32(1), st[3]),
                        ) + st[4:]
                    if with_runs:
                        # the seed cell (0,0)'s v must read the 0
                        # sentinel: dr(1,1)/lr(1,0) chain from it and a
                        # stale run would jump the walk past the origin
                        st = st[:6] + (
                            jnp.where(seed_mask, jnp.int32(0), st[6]),
                            st[7],
                        )
            prev_ref[...], prev2sh_ref[...], ch_ref[...] = st[0], st[1], st[2]
            if with_counts:
                cprev_ref[...], cprev2sh_ref[...] = st[3], st[4]
            if with_runs:
                vprev_ref[...], vprev2sh_ref[...] = st[6], st[7]
            return 0

        jax.lax.fori_loop(0, C // unroll, step, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_pairs", "band_rows", "chunk", "unroll",
        "with_counts", "pack_bits",
    ),
)
def fill_arrows_banded_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = DEFAULT_BAND_ROWS,
    chunk: int = 192,
    unroll: int = DEFAULT_UNROLL,
    with_counts: bool = False,
    pack_bits: int = 8,
):
    """Banded fill emitting band-major packed arrows + scores (+counts).

    Returns (words, scores[, counts]):
      words: int32[nbands, T_pad//P, RB, B] with ``P = 32 // pack_bits``
        — cell (j, i) of pair b is the ``(i + j%RB) % P``-th field of
        ``words[j//RB, (i + j%RB)//P, j%RB, b]`` (band-local diagonal
        ``t = i + j%RB``; out-of-table cells hold unspecified garbage,
        including the never-read cell (0,0) field).  ``pack_bits=8``
        stores the 3-bit tie mask (4 cells/word); ``pack_bits=2`` stores
        only the greedy direction code (16 cells/word — see
        :func:`_make_banded_arrows_kernel`).
      scores: int32[B] true-corner scores.
      counts: uint32[B] solution counts (``with_counts``), reference
        wraparound semantics.

    The default chunk is smaller than the scores kernel's: the
    double-buffered (chunk/P, RB, BT) word slab must fit VMEM.
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    P = 32 // pack_bits
    if nb == 0:
        empty = (
            jnp.zeros((1, 0, band_rows, 0), jnp.int32),
            jnp.zeros((0,), jnp.int32),
        )
        return empty + ((jnp.zeros((0,), jnp.uint32),) if with_counts else ())
    BT = block_pairs
    N = Bs + 1
    # the double-buffered (chunk/P, RB, BT) word slab must fit VMEM:
    # clamp the chunk so 2 * (C/P) * RB * BT * 4 bytes <= ~6.5MB
    RB_est = min(band_rows, _round_up(N, 8))
    q = _chunk_quantum(unroll)
    c_fit = (13 << 20) // (16 * RB_est * BT // P) // q * q
    if c_fit == 0:
        raise ValueError(
            f"VMEM word-slab budget cannot fit one {q}-aligned chunk at "
            f"RB={RB_est}, BT={BT}; lower band_rows/block_pairs/unroll"
        )
    chunk = min(max(chunk, q), c_fit)
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )

    call = build_arrows_call(
        RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret,
        with_counts, pack_bits=pack_bits,
    )

    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    cbnd0 = jnp.zeros((U_pad, nb_pad), jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)
    counts0 = jnp.zeros((1, nb_pad), jnp.int32)

    def band_body(carry, r):
        s = _band_scalars(m, k, d, r, RB, lens, nb)
        if with_counts:
            scores, counts, bnd, cbnd = carry
            words, part, bnd, cpart, cbnd = call(
                s, tops_sh, sides_sh, lens, bnd, bnd, cbnd, cbnd
            )
            return (
                jnp.maximum(scores, part), counts + cpart, bnd, cbnd
            ), words[0]
        scores, bnd = carry
        words, part, bnd = call(s, tops_sh, sides_sh, lens, bnd, bnd)
        return (jnp.maximum(scores, part), bnd), words[0]

    init = (
        (scores0, counts0, bnd0, cbnd0) if with_counts else (scores0, bnd0)
    )
    carry, words = jax.lax.scan(
        band_body, init, jnp.arange(nbands, dtype=jnp.int32)
    )
    out = (words, carry[0][0, :nb])
    if with_counts:
        out += (carry[1][0, :nb].astype(jnp.uint32),)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_pairs", "band_rows", "chunk", "unroll"),
)
def fill_scores_counts_banded_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = DEFAULT_BAND_ROWS,
    chunk: int = DEFAULT_CHUNK,
    unroll: int = DEFAULT_UNROLL,
):
    """(scores int32[B], counts uint32[B]) at any side length, no arrow
    storage — the banded equivalent of the reference's ``-q -s`` summary
    (computation.c:271-281), one fused wavefront with score and count
    boundary streams."""
    nb, A = tops.shape
    _, Bs = sides.shape
    if nb == 0:
        return jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.uint32)
    BT = block_pairs
    N = Bs + 1
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )
    call = build_arrows_call(
        RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret,
        with_counts=True, with_words=False,
    )

    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    cbnd0 = jnp.zeros((U_pad, nb_pad), jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)
    counts0 = jnp.zeros((1, nb_pad), jnp.int32)

    def band_body(carry, r):
        scores, counts, bnd, cbnd = carry
        s = _band_scalars(m, k, d, r, RB, lens, nb)
        part, bnd, cpart, cbnd = call(
            s, tops_sh, sides_sh, lens, bnd, bnd, cbnd, cbnd
        )
        return (jnp.maximum(scores, part), counts + cpart, bnd, cbnd), None

    (scores, counts, _, _), _ = jax.lax.scan(
        band_body, (scores0, counts0, bnd0, cbnd0),
        jnp.arange(nbands, dtype=jnp.int32),
    )
    return scores[0, :nb], counts[0, :nb].astype(jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_pairs", "chunk", "unroll", "with_counts",
        "pack_bits",
    ),
)
def fill_arrows_banded_single(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    chunk: int = DEFAULT_CHUNK,
    unroll: int = DEFAULT_UNROLL,
    with_counts: bool = False,
    pack_bits: int = 8,
):
    """Single-band arrows fill in the FLAT packed layout.

    With one band covering the whole table, the band-major layout
    degenerates to the flat kernels' diagonal-major packed-word layout:
    cell (j, i) is field ``(i+j) % P`` of ``words[(i+j) // P, j, b]``
    (``P = 32 // pack_bits``; byte-packed at the default 8) — a drop-in
    for the packed pathcount/traceback consumers, at the unrolled
    register-resident loop's throughput (59-73 GCUPS at 150bp-1kb sides
    vs the flat kernel's 43-51, measured).

    Returns (words int32[T_pad//P, N_pad, B], scores[, counts]).
    """
    nb = tops.shape[0]
    A = tops.shape[1]
    Bs = sides.shape[1]
    P = 32 // pack_bits
    RB = _round_up(Bs + 1, 8)
    # choose a chunk that divides the sweep near-evenly under the VMEM
    # slab budget: T_pad rounds up to a chunk multiple, so a clamped
    # default chunk can pad the sweep by 30%+ at short lengths
    T_est = A + RB
    q = _chunk_quantum(unroll)
    c_max = ((13 << 20) // (16 * RB * block_pairs // P)) // q * q
    if c_max == 0:
        raise ValueError(
            f"VMEM word-slab budget cannot fit one {q}-aligned chunk at "
            f"RB={RB}, BT={block_pairs}; lower block_pairs/unroll or use "
            "the multi-band layout"
        )
    nch = -(-T_est // c_max)
    chunk = _round_up(-(-T_est // nch), q)
    out = fill_arrows_banded_batch(
        tops, sides, lens1, lens2, m, k, d,
        interpret=interpret, block_pairs=block_pairs,
        band_rows=RB, chunk=chunk, unroll=unroll,
        with_counts=with_counts, pack_bits=pack_bits,
    )
    return (out[0][0][:, :, :nb],) + out[1:]


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_pairs", "unroll"),
)
def fill_greedy_banded_single(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    unroll: int = 16,
):
    """Single-band GREEDY arrows fill: 2-bit direction codes, 16 cells
    per int32 word (the ``pack_bits=2`` flat layout) — the feed for
    greedy-only tracebacks, at ~1/4 the word traffic of the 3-bit path.

    Cell (j, i) of pair b is bits ``2 * ((i+j) & 15)`` of
    ``words[(i+j) >> 4, j, b]``: 0 diag, 1 left, 2 up (the reference
    DFS's descend priority, needleman-wunsch.c:305-324).

    Returns (words int32[T_pad//16, N_pad, B], scores int32[B]).
    """
    return fill_arrows_banded_single(
        tops, sides, lens1, lens2, m, k, d,
        interpret=interpret, block_pairs=block_pairs,
        unroll=unroll, with_counts=False, pack_bits=2,
    )


def build_arrows_call(
    RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret,
    with_counts, with_words=True, pack_bits=8, with_runs=False,
):
    """The compiled arrows-band sweep: call(s, tops_sh, sides_sh, lens,
    bnd, bnd[, cbnd, cbnd]) -> ([words (1, T_pad//P, RB, nb_pad),]
    score partial, bnd_out[, count partial, cbnd_out]) with
    ``P = 32 // pack_bits`` cells per word (see
    :func:`_make_banded_arrows_kernel` for the two packings).

    ``with_words=False, with_counts=True`` is the fused score+count
    sweep — the reference's ``-s`` summary with no arrow storage."""
    P = 32 // pack_bits
    if unroll % P:
        raise ValueError(
            f"unroll must be a multiple of {P} for {pack_bits}-bit packing"
        )
    if C % P:
        raise ValueError(f"chunk must be a multiple of {P}, got {C}")
    n_bnd_streams = 2 if with_counts else 1
    out_shapes = []
    out_specs = []
    if with_words:
        out_shapes.append(
            # one band plane per call; the band scan stacks them
            jax.ShapeDtypeStruct((1, T_pad // P, RB, nb_pad), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec(
                (None, C // P, RB, BT), lambda b, c, s: (0, c, 0, b),
                memory_space=pltpu.VMEM,
            )
        )
    out_shapes += [
        jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
    ]
    out_specs += [
        pl.BlockSpec((1, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM),
    ]
    if with_counts:
        out_shapes += [
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec(
                (1, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM
            ),
        ]
    bnd_spec = [
        pl.BlockSpec(
            (C, BT), lambda b, c, s: (c + lag0, b), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (C, BT), lambda b, c, s: (c + lag0 + 1, b),
            memory_space=pltpu.VMEM,
        ),
    ]
    scratch = [
        pltpu.VMEM((RB, BT), jnp.int32),  # prev
        pltpu.VMEM((RB, BT), jnp.int32),  # shift(prev2)
        pltpu.VMEM((RB, BT), jnp.int32),  # rolling top chars
        pltpu.VMEM((C, BT), jnp.int32),   # boundary window
        pltpu.VMEM((8, BT), jnp.int32),   # boundary-out staging
    ]
    if with_counts:
        scratch += [
            pltpu.VMEM((RB, BT), jnp.int32),  # prev count
            pltpu.VMEM((RB, BT), jnp.int32),  # shift(prev2) count
            pltpu.VMEM((C, BT), jnp.int32),   # count boundary window
            pltpu.VMEM((8, BT), jnp.int32),   # count boundary staging
        ]
    if with_runs:
        scratch += [
            pltpu.VMEM((RB, BT), jnp.int32),  # prev run-byte v
            pltpu.VMEM((RB, BT), jnp.int32),  # shift(prev2) run-byte v
        ]

    call = pl.pallas_call(
        _make_banded_arrows_kernel(
            RB, C, off, unroll, with_counts, with_words, pack_bits,
            with_runs,
        ),
        out_shape=tuple(out_shapes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb_pad // BT, T_pad // C),
            in_specs=[
                pl.BlockSpec(
                    (C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RB, BT), lambda b, c, s: (s[3], b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM
                ),
            ]
            + bnd_spec * n_bnd_streams,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return call


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_pairs", "band_rows", "chunk", "unroll"),
)
def fill_scores_banded_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = DEFAULT_BAND_ROWS,
    chunk: int = DEFAULT_CHUNK,
    unroll: int = DEFAULT_UNROLL,
):
    """Score a batch of pairs of ANY side length (banded wavefront).

    Args:
      tops: int32[B, A] encoded top strings (PAD_TOP padded).
      sides: int32[B, Bs] encoded side strings (PAD_SIDE padded).
      lens1, lens2: int32[B] true lengths.
      m, k, d: scoring params.
      band_rows: band height RB (multiple of 8; clamped to the table).
      chunk: diagonals per grid step (rounded up to a unroll multiple).
      unroll: diagonals advanced per state-register round-trip.
    Returns:
      int32[B] optimal scores (true corner per pair).
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    if nb == 0:
        return jnp.zeros((0,), jnp.int32)
    BT = block_pairs
    N = Bs + 1
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )

    call = build_scores_call(
        RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret
    )

    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)

    def band_body(carry, r):
        scores, bnd = carry
        s = _band_scalars(m, k, d, r, RB, lens, nb)
        part, bnd = call(s, tops_sh, sides_sh, lens, bnd, bnd)
        return (jnp.maximum(scores, part), bnd), None

    (scores, _), _ = jax.lax.scan(
        band_body, (scores0, bnd0), jnp.arange(nbands, dtype=jnp.int32)
    )
    return scores[0, :nb]
