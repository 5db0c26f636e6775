"""Row-sweep GREEDY arrows fill: 2-bit direction codes, row-major words.

Same inter-pair row-sweep engine as fill_rowsweep.py (batch fills the
(8, 128) vreg, R skewed rows in flight, single in-place VMEM row
buffer), emitting the 2-bit greedy walk code per cell on top of the
score recurrence — the short-side feed for greedy tracebacks, replacing
the single-band diagonal-major kernel's 2.04x wavefront slot overhead.

Word layout (row-major, 16 cells/word): cell (i, j) of pair b — i over
s1/tops rows 1..len1, j over s2/sides columns 0..len2 — is bits
``2 * (j & 15)`` of ``words[i-1, j >> 4, b]``.  Codes are the OP_*
encoding with the reference's tie priority (diag first, then the
s1-consuming move, then the s2-consuming move — the DFS descend order
diag > left > up of needleman-wunsch.c:305-324):

* 0 = OP_DIAG
* 1 = OP_LEFT — from (i-1, j): consumes s1[i-1] (the kernel's
  previous-ROW candidate; the reference's "left" axis is s1,
  needleman-wunsch.c:307-312)
* 2 = OP_UP — from (i, j-1): consumes s2[j-1]

Column j = 0 cells are stored (their code is OP_LEFT by the NEG_INF
boundary induction — only the s1 move exists); row i = 0 is never
stored, the walker substitutes OP_UP.

The flag derivation is fused exactly like the banded greedy kernel
(fill_pallas_banded.py): the code comes from the PRE-max operands
(diag wins iff cand_d >= max3-rest; else s1-move wins iff its operand
>= the s2 operand), with the pack shift folded into the select
constants — no equality-flag encode, no shift op.

The i axis is split across an inner grid dimension (TPU grid execution
is sequential, scratch carries across) so the words output block stays
inside VMEM at any side length the engine serves (<= ~512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP

NEG_INF = -(2**30)
_SL, _LN = 8, 128
_PB = _SL * _LN


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _c32(v: int):
    """Wrap a shifted pack constant to signed int32."""
    return jnp.int32(((v + 2**31) % 2**32) - 2**31)


def _make_kernel(
    L1b: int, L2p: int, W16: int, R: int, PCH: int, NCH: int,
    SL: int = _SL,
):
    C16 = (L2p + R + 15) // 16 + 1  # sweep + skew + flush tail

    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref, words_ref, scr_ref,
        row_ref, cap_ref,
    ):
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        ic = pl.program_id(1)

        len1 = lens_ref[0]
        len2 = lens_ref[1]

        @pl.when(ic == 0)
        def _():
            jj = jax.lax.broadcasted_iota(
                jnp.int32, (L2p + 1, SL, _LN), 0
            )
            row_ref[...] = jj * (-d)
            cap_ref[...] = jnp.where(
                len1 == 0, -len2 * d, jnp.int32(NEG_INF)
            )

        neg = jnp.full((SL, _LN), NEG_INF, jnp.int32)
        chz = jnp.full((SL, _LN), -5, jnp.int32)
        zero = jnp.zeros((SL, _LN), jnp.int32)

        def one_pass(pc, cap):
            i0 = pc * R  # rows (local to this chunk) i0 .. i0+R-1
            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1b - 1), 1)][0]
                for r in range(R)
            ]
            hit_row = [
                len1 == (ic * L1b + i0 + r + 1) for r in range(R)
            ]
            gate = s_ref[3 + ic * PCH + pc] != 0

            def chunk(c16, carry):
                scores, prevs, win, ld_prev, wregs, cap = carry
                s0 = c16 * 16
                scores = list(scores)
                prevs = list(prevs)
                win = list(win)
                wregs = list(wregs)
                for u in range(16):
                    s = s0 + u
                    ld = row_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                    ch_new = sides_ref[
                        pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)
                    ][0]
                    win = [ch_new] + win[:-1]

                    new = []
                    for r in range(R):
                        up = ld if r == 0 else scores[r - 1]
                        diag = ld_prev if r == 0 else prevs[r - 1]
                        left = scores[r]
                        sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                        cand_d = diag + sub
                        mx = jnp.maximum(up, left) - d
                        new.append(jnp.maximum(cand_d, mx))
                        # 2-bit code, pack shift folded into constants;
                        # s1 move (code 1) is `up` here — see module doc.
                        # jj = s0+u-r with s0 % 16 == 0, so the pack
                        # phase (u-r) % 16 is static
                        sh = 2 * ((u - r) % 16)
                        word = jnp.where(
                            cand_d >= mx,
                            jnp.int32(0),
                            jnp.where(
                                up >= left, _c32(1 << sh), _c32(2 << sh)
                            ),
                        )
                        wregs[r] = (
                            word if sh == 0 else wregs[r] | word
                        )
                    # flush: row r completes a word when jj % 16 == 15,
                    # i.e. u == (15 + r) % 16 (static per r)
                    for r in range(R):
                        if u == (15 + r) % 16:
                            wcol = c16 + (u - r - 15) // 16

                            @pl.when((wcol >= 0) & (wcol < W16))
                            def _(r=r, wcol=wcol):
                                words_ref[
                                    pl.ds(i0 + r, 1), pl.ds(wcol, 1)
                                ] = wregs[r][None, None]

                            wregs[r] = zero
                    ld_prev, prevs, scores = ld, scores, new

                    # upper gate: the flush-tail steps (s past the real
                    # sweep) must not clamp-store onto row_ref[L2p]
                    @pl.when((s >= R - 1) & (s - (R - 1) <= L2p))
                    def _(new=new, s=s):
                        row_ref[pl.ds(s - (R - 1), 1)] = new[R - 1][None]

                    def capture(cap, new=new, s=s):
                        for r in range(R):
                            hit = hit_row[r] & (len2 == (s - r))
                            cap = jnp.where(hit, new[r], cap)
                        return cap

                    cap = jax.lax.cond(gate, capture, lambda c: c, cap)
                return (
                    tuple(scores), tuple(prevs), tuple(win), ld_prev,
                    tuple(wregs), cap,
                )

            carry = (
                (neg,) * R, (neg,) * R, (chz,) * R, neg, (zero,) * R, cap,
            )
            carry = jax.lax.fori_loop(0, C16, chunk, carry)
            return carry[5]

        cap = jax.lax.fori_loop(0, PCH, one_pass, cap_ref[...])
        cap_ref[...] = cap
        scr_ref[...] = cap

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def fill_greedy_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, d, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Batched greedy 2-bit arrows + corner scores, row-sweep engine.

    Returns ``(words int32[L1w, W16, nbp], scores int32[nb])`` with
    ``words`` in the row-major layout consumed by
    :func:`nw_tpu.ops.traceback.traceback_greedy2_rowmajor` (slice
    pairs off the last axis; nbp >= nb is the block quantum,
    ``groups * 1024`` pairs).  ``rows``/``groups`` are the same ILP
    knobs as ``fill_scores_rowsweep_batch``'s.
    """
    nb, L1 = tops.shape
    _, L2 = sides.shape
    R = rows
    SL = _SL * groups
    PB = SL * _LN
    L1p = max(L1, 1)
    L2p = max(L2, 1)
    W16 = (L2p + 1 + 15) // 16
    nbp = _round_up(max(nb, 1), PB)
    nblk = nbp // PB

    # rows per grid chunk: fit the words block (double-buffered) in
    # ~3 MB of VMEM, quantized to whole passes
    budget_rows = max((3 << 20) // (W16 * PB * 4), 1)
    npass_real = -(-L1p // R)
    PCH = min(max(budget_rows // R, 1), npass_real)
    NCH = -(-npass_real // PCH)
    PCH = -(-npass_real // NCH)  # re-balance: minimize padded rows
    L1b = PCH * R
    L1w = NCH * L1b

    tops = jnp.pad(
        tops, ((0, nbp - nb), (0, L1w - L1)), constant_values=PAD_TOP
    ).astype(jnp.int32)
    sides = jnp.pad(
        sides, ((0, nbp - nb), (0, L2p - L2)), constant_values=PAD_SIDE
    ).astype(jnp.int32)
    l1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nbp - nb))
    l2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nbp - nb))

    tops_r = tops.T.reshape(L1w, nblk * SL, _LN)
    sides_r = sides.T.reshape(L2p, nblk * SL, _LN)
    lens_r = jnp.stack([l1, l2]).reshape(2, nblk * SL, _LN)

    npass = NCH * PCH
    pid = np.arange(npass, dtype=np.int32) * R
    hit = jnp.any(
        (l1[None, :] > jnp.asarray(pid)[:, None])
        & (l1[None, :] <= jnp.asarray(pid)[:, None] + R),
        axis=1,
    ).astype(jnp.int32)
    scalars = jnp.concatenate([jnp.asarray([m, k, d], jnp.int32), hit])

    words, scores = pl.pallas_call(
        _make_kernel(L1b, L2p, W16, R, PCH, NCH, SL),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk, NCH),
            in_specs=[
                pl.BlockSpec((L1b, SL, _LN), lambda b, ic, s: (ic, b, 0)),
                pl.BlockSpec((L2p, SL, _LN), lambda b, ic, s: (0, b, 0)),
                pl.BlockSpec((2, SL, _LN), lambda b, ic, s: (0, b, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (L1b, W16, SL, _LN), lambda b, ic, s: (ic, 0, b, 0)
                ),
                pl.BlockSpec((SL, _LN), lambda b, ic, s: (b, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((L2p + 1, SL, _LN), jnp.int32),
                pltpu.VMEM((SL, _LN), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((L1w, W16, nblk * SL, _LN), jnp.int32),
            jax.ShapeDtypeStruct((nblk * SL, _LN), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, tops_r, sides_r, lens_r)
    words = words.reshape(L1w, W16, nbp)
    return words, scores.reshape(nbp)[:nb]
