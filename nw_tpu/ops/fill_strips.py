"""Single-pair strips-in-slots score kernel: ONE huge pair at
row-sweep throughput.

The fold-layout kernel (fill_pallas_single.py) keeps a single pair's
anti-diagonal in the vector unit but pays a lane-rotate + lane-0 fixup
+ masked char extraction EVERY diagonal step (~61 GCUPS at 100 kb).
This engine instead runs the intra-chip analogue of the config-5
multi-device pipeline (parallel/huge_pair.py): the 1024 vector slots
(8 sublanes x 128 lanes) are 1024 COLUMN STRIPS of the same pair, W =
ceil(N/1024) columns each, and strips advance through K*R-row chunks
in a phase-skewed pipeline — slot q works chunk t = phase - q, so the
halo a strip needs from its left neighbor (the neighbor's right-edge
column of the SAME rows, computed one phase earlier) moves laterally
by ONE slot per phase via fill_pallas_single.fold_shift_j.  All
cross-slot traffic is K*R+1 edge values and K*R top chars per PHASE
(amortized over W*K*R cells), so the inner loop is exactly the
row-sweep step (fill_rowsweep.py): R skewed rows in flight over a
per-strip VMEM row buffer, K sequential R-row passes per phase (K
amortizes the ~4 us/phase grid+relay overhead without raising the
live-register count past the R=8 sweet spot).

Deltas vs the batch row-sweep kernel:

* a strip's FIRST column takes true interior inputs, not an inducible
  boundary: at the per-register step ``s == r`` the left/diag chain
  substitutes the neighbor-edge registers E[r+1]/E[r], where
  E[x] = H[i0 + x, left-edge column] (x = 0..K*R; E[0], the row above
  the chunk, is the neighbor's bottom-row edge from TWO phases back,
  relayed through a delayed scratch plane);
* top chars differ per slot (each slot sits at its own chunk), so
  they ride the same lateral relay, injected at slot 0 from a
  per-phase (8,128) char plane (slot u holds top[t*K*R + u]; a static
  lane-roll brings element kk*R+r to slot 0 for fold_shift_j's fill);
* pipeline fill/drain: P = nch + 1023 phases — the engine approaches
  the row-sweep ceiling as the pair grows (133+ GCUPS at 200 kb).

Reference semantics: the NW recurrence + corner score of
needleman-wunsch.c:418-510 / computation.c:96-120 for one pair of any
length, O(N) memory, no arrows.  Exactness: tests/test_strips.py
(interpret, incl. the W == 1 edge-capture ordering) +
scripts/tpu_validate.py vs the fold engine on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP
from nw_tpu.ops.fill_pallas_single import fold_shift_j
from nw_tpu.ops.fill_rowsweep import _natc

NEG_INF = -(2**30)
_SL, _LN = 8, 128
_NS = _SL * _LN  # strips = vector slots


def _make_strips_kernel(W: int, R: int, K: int, P: int, A_real: int):
    KR = K * R

    def kernel(sc_ref, chars_ref, sides_ref, out_ref,
               row_ref, e_ref, ch_ref, cap_ref):
        m = sc_ref[0]
        kmis = sc_ref[1]
        d = sc_ref[2]
        p_star = sc_ref[3]
        s_star = sc_ref[4]
        r_star = sc_ref[5]
        q_star = sc_ref[6]
        kk_star = sc_ref[7]
        p = pl.program_id(0)

        l_iota = jax.lax.broadcasted_iota(jnp.int32, (_SL, _LN), 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (_SL, _LN), 0)
        q_iota = s_iota * _LN + l_iota  # slot = strip index

        @pl.when(p == 0)
        def _():
            # strip q's row buffer starts as DP row 0 over its
            # columns: H[0, j] = -j*d, j = q*W + c + 1
            cc = jax.lax.broadcasted_iota(jnp.int32, (W, _SL, _LN), 0)
            ss = jax.lax.broadcasted_iota(jnp.int32, (W, _SL, _LN), 1)
            ll = jax.lax.broadcasted_iota(jnp.int32, (W, _SL, _LN), 2)
            row_ref[...] = ((ss * _LN + ll) * W + cc + 1) * (-d)
            e_ref[...] = jnp.full(
                (KR + 2, _SL, _LN), NEG_INF, jnp.int32
            )
            cap_ref[...] = jnp.full((_SL, _LN), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((KR, _SL, _LN), -5, jnp.int32)

        neg = _natc(q_iota, NEG_INF)
        chz = _natc(q_iota, -5)

        # ---- lateral relay: slot q takes slot q-1's last-phase edge
        # and char planes; slot 0 takes the true column-0 boundary and
        # fresh top chars.  E[0] = H[i0, edge] is the neighbor's
        # bottom-row edge of its chunk TWO phases back: e_ref[KR+1]
        # holds each slot's own E[KR] as of the previous phase's
        # START, so one shift lands the right value.
        chrow = chars_ref[pl.ds(0, 1)][0]  # slot u = top[t*KR+u] (+8)
        eaR_next = e_ref[pl.ds(KR, 1)][0]
        E = []
        for x in range(KR + 1):
            src = e_ref[pl.ds(KR + 1 if x == 0 else x, 1)][0]
            E.append(
                fold_shift_j(src, -(p * KR + x) * d, l_iota, q_iota)
            )
        # chunk 0 has no computed row above: E[0] is the DP row-0
        # boundary at the neighbor's edge column, H[0, q*W] = -qW*d
        E[0] = jnp.where(q_iota == p, -(q_iota * W) * d, E[0])
        ch = []
        for x in range(KR):
            fill_vec = (
                chrow if x == 0 else pltpu.roll(chrow, _LN - x, axis=1)
            ) - 8
            ch.append(
                fold_shift_j(
                    ch_ref[pl.ds(x, 1)][0], fill_vec, l_iota, q_iota
                )
            )

        cap = cap_ref[...]
        for kk in range(K):
            Ek = E[kk * R: kk * R + R + 1]
            chk = ch[kk * R: kk * R + R]
            # pipeline-bubble / pad sub-chunks must not corrupt the
            # row buffer with warm-up/drain garbage
            valid = (p >= q_iota) & (
                (p - q_iota) * KR + kk * R < A_real
            )

            def make_step(esub: bool, ecap: bool):
                """Sweep-step body; the edge substitution (first R
                steps) and edge capture (last R steps) are compiled
                only into the regions that need them, so the bulk of
                the sweep runs the plain row-sweep recurrence."""

                def step(s, st, Ek=Ek, chk=chk, valid=valid, kk=kk):
                    scores, prevs, win, ld_prev, Eout, cap = st
                    ld = row_ref[pl.ds(jnp.minimum(s, W - 1), 1)][0]
                    ch_side = sides_ref[
                        pl.ds(jnp.clip(s, 0, W - 1), 1)
                    ][0]
                    win = (ch_side,) + win[:-1]

                    Eout = list(Eout)
                    new = []
                    for r in range(R):
                        up = ld if r == 0 else scores[r - 1]
                        diag = ld_prev if r == 0 else prevs[r - 1]
                        left = scores[r]
                        if esub:
                            # first column of the strip: true
                            # neighbor-edge values (Ek is read-only:
                            # at W == 1 the edge CAPTURE step W-1+r
                            # precedes the edge READ step r+1, so
                            # captures go to separate Eout registers)
                            left = jnp.where(s == r, Ek[r + 1], left)
                            diag = jnp.where(s == r, Ek[r], diag)
                        sub = jnp.where(chk[r] == win[r], m, -kmis)
                        new.append(
                            jnp.maximum(
                                diag + sub, jnp.maximum(up, left) - d
                            )
                        )

                    @pl.when((s >= R - 1) & (s - (R - 1) <= W - 1))
                    def _():
                        idx = pl.ds(s - (R - 1), 1)
                        old = row_ref[idx][0]
                        row_ref[idx] = jnp.where(
                            valid, new[R - 1], old
                        )[None]

                    if ecap:
                        # right-edge capture:
                        # Eout[r] = H[i0 + kk*R + r + 1, own edge]
                        for r in range(R):
                            Eout[r] = jnp.where(
                                s == W - 1 + r, new[r], Eout[r]
                            )

                    # corner capture: H[len1, len2] is `new[r*]` at
                    # exactly one (phase, sub-chunk, step, slot)
                    def grab(cap):
                        hit = q_iota == q_star
                        for r in range(R):
                            cap = jnp.where(
                                hit & (r_star == r), new[r], cap
                            )
                        return cap

                    cap = jax.lax.cond(
                        (p == p_star) & (kk == kk_star) & (s == s_star),
                        grab, lambda c: c, cap,
                    )
                    return (
                        tuple(new), tuple(scores), win, ld,
                        tuple(Eout), cap,
                    )

                return step

            st = (
                (neg,) * R, (neg,) * R, (chz,) * R, neg, (neg,) * R,
                cap,
            )
            if W >= R + 2:
                # three regions: [0,R) with edge substitution,
                # [R, W-1) plain, [W-1, W+R-1) with edge capture
                st = jax.lax.fori_loop(0, R, make_step(True, False), st)
                st = jax.lax.fori_loop(
                    R, W - 1, make_step(False, False), st
                )
                st = jax.lax.fori_loop(
                    W - 1, W + R - 1, make_step(False, True), st
                )
            else:
                st = jax.lax.fori_loop(
                    0, W + R - 1, make_step(True, True), st
                )
            Eout, cap = st[4], st[5]
            for r in range(R):
                e_ref[pl.ds(kk * R + r + 1, 1)] = Eout[r][None]

        cap_ref[...] = cap
        for x in range(KR):
            ch_ref[pl.ds(x, 1)] = ch[x][None]
        # own previous-phase E[KR] -> the two-phase-delayed E[0] source
        e_ref[pl.ds(KR + 1, 1)] = eaR_next[None]

        @pl.when(p == P - 1)
        def _():
            out_ref[...] = cap_ref[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "chunks", "interpret")
)
def strips_score(
    top, side, m, k, d, len1=None, len2=None, *, rows: int = 8,
    chunks: int = 1, interpret: bool = False,
):
    """Optimal NW score of ONE pair (encoded int arrays), any length.

    O(N) memory.  ``rows`` (R, skewed rows in flight) and ``chunks``
    (K, R-row passes per pipeline phase) are ILP knobs; K*R <= 128
    (the char-injection lane roll).  ``len1``/``len2`` are the true
    lengths (dynamic; padding decays).
    """
    A = int(top.shape[0])
    N = int(side.shape[0])
    if len1 is None:
        len1 = A
    if len2 is None:
        len2 = N
    len1 = jnp.asarray(len1, jnp.int32)
    len2 = jnp.asarray(len2, jnp.int32)
    R, K = rows, chunks
    KR = K * R
    if KR > _LN:
        raise ValueError(f"chunks*rows must be <= {_LN}, got {KR}")

    W = max(-(-N // _NS), 1)
    nch = max(-(-A // KR), 1)
    P = nch + _NS - 1

    side_pad = jnp.pad(
        side.astype(jnp.int32), (0, W * _NS - N),
        constant_values=PAD_SIDE,
    )
    sides_r = side_pad.reshape(_NS, W).T.reshape(W, _SL, _LN)

    # per-phase char planes: chars_r[t, s, l] = top[t*KR + (s*128+l)]
    # (+8 bias keeps PAD_TOP positive; only slots u < KR are read)
    top_pad = jnp.pad(
        top.astype(jnp.int32), (0, nch * KR - A),
        constant_values=PAD_TOP,
    )
    reps = -(-_NS // KR)
    chars_flat = jnp.tile(
        top_pad.reshape(nch, KR), (1, reps)
    )[:, :_NS] + 8
    chars_r = chars_flat.reshape(nch, _SL, _LN)

    # the corner H[len1, len2] coordinates (len1/len2 >= 1; len == 0
    # is closed-form below and the gates never fire)
    t_star = (len1 - 1) // KR
    kk_star = ((len1 - 1) % KR) // R
    r_star = (len1 - 1) % R
    q_star = (len2 - 1) // W
    lc_star = (len2 - 1) % W
    # (len1 > 0) & (len2 > 0), NOT len1*len2 > 0: the product of two
    # ~50k lengths overflows int32 and silently disables the capture
    p_star = jnp.where((len1 > 0) & (len2 > 0), t_star + q_star, -1)
    s_star = lc_star + r_star

    scalars = jnp.stack(
        [jnp.asarray(x, jnp.int32) for x in (m, k, d)]
        + [p_star, s_star, r_star, q_star, kk_star]
    )

    out = pl.pallas_call(
        _make_strips_kernel(W, R, K, P, nch * KR),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[
                pl.BlockSpec(
                    (1, _SL, _LN),
                    lambda p, s: (jnp.minimum(p, nch - 1), 0, 0),
                ),
                pl.BlockSpec((W, _SL, _LN), lambda p, s: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((_SL, _LN), lambda p, s: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((W, _SL, _LN), jnp.int32),       # row buffer
                pltpu.VMEM((KR + 2, _SL, _LN), jnp.int32),  # E + delay
                pltpu.VMEM((KR, _SL, _LN), jnp.int32),      # chars
                pltpu.VMEM((_SL, _LN), jnp.int32),          # cap
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_SL, _LN), jnp.int32),
        interpret=interpret,
    )(scalars, chars_r, sides_r)

    return jnp.where(
        (len1 == 0) | (len2 == 0), -(len1 + len2) * d, jnp.max(out)
    )
