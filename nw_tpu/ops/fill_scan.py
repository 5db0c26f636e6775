"""Anti-diagonal Needleman-Wunsch fill as a ``jax.lax.scan``.

This is the TPU-native restatement of the reference's cell-at-a-time fill
(``score_cell`` / ``score_cell_column`` / ``compute_table_scores``,
needleman-wunsch.c:418-626).  The reference extracts parallelism with a
per-cell mutex/condvar pipeline across pthreads; here the dependency
structure itself is exploited: every cell on an anti-diagonal ``k = i + j``
depends only on diagonals ``k-1`` and ``k-2``, so one diagonal is one
vectorized step and the whole fill is a scan of ``M+N-2`` steps carrying
two rolling diagonal vectors — no locks, no atomics, and the scores never
round-trip through HBM between steps.

Table orientation matches the reference (computation.c:154-161): the "top"
string ``s1`` spans columns ``i`` (M = len(s1)+1 columns), the "side"
string ``s2`` spans rows ``j`` (N = len(s2)+1 rows).

Outputs are stored diagonal-major: ``D[k, j]`` holds cell
``(row=j, col=k-j)``.  This makes every scan step a contiguous vector
write (no scatters); the rectangular view is a cheap gather
(:func:`diag_to_matrix`).

Scoring semantics are bit-identical to the reference:

* boundary row 0: ``score = i * (-d)``, arrow LEFT (computation.c:104-110)
* boundary col 0: ``score = j * (-d)``, arrow UP  (computation.c:114-120)
* interior (needleman-wunsch.c:430-465): ``max(diag + (m | -k), up - d,
  left - d)`` with an arrow bit for *every* candidate equal to the max
  (ties preserved, needleman-wunsch.c:485-503).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.int32(-(2**30))  # sentinel (numpy: module-scope jnp would init the backend)


def num_diagonals(len1: int, len2: int) -> int:
    """Number of anti-diagonals of the (len2+1) x (len1+1) table."""
    return len1 + len2 + 1


@functools.partial(jax.jit, static_argnames=("with_scores", "with_arrows"))
def fill_diag(
    top,
    side,
    m,
    k,
    d,
    len1=None,
    len2=None,
    with_scores: bool = False,
    with_arrows: bool = True,
):
    """Fill the DP table along anti-diagonals.

    Args:
      top: int32[A] encoded top string (s1) — columns (possibly padded).
      side: int32[B] encoded side string (s2) — rows (possibly padded).
      m, k, d: match bonus / mismatch penalty / indel penalty (int32).
      len1, len2: true (unpadded) lengths; the returned ``score`` is read
        at the true corner cell (len2, len1).  Default: the padded corner.
        Padding never contaminates the true rectangle because the NW
        recurrence only reads smaller row/col indices (see ops/encode.py).
      with_scores: also return the full diagonal-major score table
        (needed for ``-t`` rendering).
      with_arrows: return packed arrows (disable for score-only fills).

    Returns:
      dict with:
        ``score``: int32 — score at the true corner (the optimal
          alignment score).
        ``arrows``: uint8[K, N] diagonal-major packed arrows (if
          ``with_arrows``); K = A+B+1 diagonals, N = B+1 rows.
        ``scores``: int32[K, N] diagonal-major scores (if
          ``with_scores``); cells outside the table hold ``NEG_INF``.
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
    k_corner = len1 + len2

    m = jnp.asarray(m, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    d = jnp.asarray(d, jnp.int32)

    # side character for row j is side[j-1]; row 0 gets a non-matching
    # sentinel (it is never an interior row).
    side_sh = jnp.concatenate([jnp.full((1,), -3, jnp.int32), side.astype(jnp.int32)])

    # top character for the cell at (diag kk, row j) is top[kk-1-j]; as j
    # varies this is a contiguous slice of reversed(top).  Pad both ends so
    # every slice is in bounds:  top[x] = top_rev[A-1-x], x = kk-1-j
    # => index into top_ext is (N + A - kk) + j.
    top_rev = top[::-1].astype(jnp.int32)
    pad = jnp.full((N,), -4, jnp.int32)
    top_ext = jnp.concatenate([pad, top_rev, pad])

    j_idx = jnp.arange(N, dtype=jnp.int32)

    # Zero that carries the inputs' varying-axes type: under shard_map,
    # scan carries initialized from plain constants would differ in vma
    # type from the body outputs (which depend on sharded inputs).
    vary0 = (top.sum() + side.sum() + len1 + len2).astype(jnp.int32) * 0

    # Diagonal 0: only cell (0,0) with score 0 and no arrows
    # (computation.c:96-100).
    diag0_scores = jnp.where(j_idx == 0, jnp.int32(0), NEG_INF) + vary0
    prev2_init = jnp.full((N,), NEG_INF, jnp.int32) + vary0  # "diagonal -1"

    def step(carry, kk):
        prev, prev2, captured = carry
        i_idx = kk - j_idx  # column index of each lane
        valid = (i_idx >= 0) & (i_idx <= A)
        interior = valid & (j_idx >= 1) & (i_idx >= 1)

        ch_top = jax.lax.dynamic_slice(top_ext, (N + A - kk,), (N,))
        sub = jnp.where(ch_top == side_sh, m, -k)

        # shift down by one lane: lane j reads former lane j-1
        prev_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev[:-1]])
        prev2_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev2[:-1]])

        cand_diag = prev2_sh + sub  # (j-1, i-1) on diagonal k-2
        cand_up = prev_sh - d       # (j-1, i)   on diagonal k-1
        cand_left = prev - d        # (j,   i-1) on diagonal k-1

        score = jnp.maximum(jnp.maximum(cand_diag, cand_up), cand_left)
        arrows = (
            (cand_diag == score).astype(jnp.uint8)
            | ((cand_left == score).astype(jnp.uint8) << 1)
            | ((cand_up == score).astype(jnp.uint8) << 2)
        )
        arrows = jnp.where(interior, arrows, jnp.uint8(0))
        score = jnp.where(interior, score, NEG_INF)

        # Boundary row 0 (j == 0, i = kk >= 1): i*(-d), LEFT.
        on_top_row = valid & (j_idx == 0)
        score = jnp.where(on_top_row, -kk * d, score)
        arrows = jnp.where(on_top_row, jnp.uint8(2), arrows)
        # Boundary col 0 (i == 0 -> j == kk >= 1): j*(-d), UP.
        on_left_col = valid & (i_idx == 0)
        score = jnp.where(on_left_col, -kk * d, score)
        arrows = jnp.where(on_left_col, jnp.uint8(4), arrows)

        # Capture the true-corner score as the wavefront passes it.
        captured = jnp.where(
            kk == k_corner,
            jax.lax.dynamic_index_in_dim(score, len2, keepdims=False),
            captured,
        )

        ys = []
        if with_scores:
            ys.append(score)
        if with_arrows:
            ys.append(arrows)
        return (score, prev, captured), tuple(ys)

    ks = jnp.arange(1, K, dtype=jnp.int32)
    captured0 = jnp.int32(0) + vary0  # corner (0,0) when both lengths are 0
    (_, _, captured), ys = jax.lax.scan(
        step, (diag0_scores, prev2_init, captured0), ks
    )

    out = {"score": captured}
    yi = 0
    if with_scores:
        out["scores"] = jnp.concatenate([diag0_scores[None], ys[yi]])
        yi += 1
    if with_arrows:
        out["arrows"] = jnp.concatenate([jnp.zeros((1, N), jnp.uint8), ys[yi]])
    return out


# Batched variants: one pair per leading-dim row (all padded to a bucket).
fill_diag_batch = jax.jit(
    jax.vmap(
        lambda top, side, m, k, d, l1, l2: fill_diag(
            top, side, m, k, d, l1, l2, with_scores=False, with_arrows=True
        ),
        in_axes=(0, 0, None, None, None, 0, 0),
    ),
)

fill_scores_batch = jax.jit(
    jax.vmap(
        lambda top, side, m, k, d, l1, l2: fill_diag(
            top, side, m, k, d, l1, l2, with_scores=False, with_arrows=False
        )["score"],
        in_axes=(0, 0, None, None, None, 0, 0),
    ),
)


def diag_to_matrix(diag, len1: int, len2: int):
    """Convert a diagonal-major table D[k, j] to rectangular H[j, i].

    ``H[j, i] = D[i + j, j]``.  Works on numpy or jnp arrays; the result
    is the true (len2+1, len1+1) table (pad region sliced away).
    """
    import numpy as np

    D = np.asarray(diag)
    N, M = len2 + 1, len1 + 1
    jj, ii = np.mgrid[0:N, 0:M]
    return D[ii + jj, jj]


def fill_matrix(top, side, m, k, d):
    """Convenience: rectangular (N, M) scores and arrows for one pair.

    Used by the CLI and tests; production batched paths keep the
    diagonal-major layout.
    """
    import numpy as np

    A, B = int(top.shape[0]), int(side.shape[0])
    out = fill_diag(top, side, m, k, d, with_scores=True)
    scores = diag_to_matrix(np.asarray(out["scores"]), A, B)
    arrows = diag_to_matrix(np.asarray(out["arrows"]), A, B)
    return scores, arrows


@jax.jit
def fill_last_row(top, side, m, k, d, len1, len2):
    """Scores of the DP row ``len2`` for columns 0..A (valid through
    ``len1``) — the building block of Hirschberg's linear-space
    traceback (ops/hirschberg.py).

    Runs the same anti-diagonal scan but emits only one scalar per step
    (the wavefront's value at row ``len2``), so memory is O(A+B) instead
    of O(A*B).  ``H[len2, i]`` sits on diagonal ``len2 + i``.
    """
    A = top.shape[0]
    B = side.shape[0]
    N = B + 1
    K = A + B + 1

    m = jnp.asarray(m, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    d = jnp.asarray(d, jnp.int32)
    len2 = jnp.asarray(len2, jnp.int32)

    side_sh = jnp.concatenate([jnp.full((1,), -3, jnp.int32), side.astype(jnp.int32)])
    top_rev = top[::-1].astype(jnp.int32)
    pad = jnp.full((N,), -4, jnp.int32)
    top_ext = jnp.concatenate([pad, top_rev, pad])

    j_idx = jnp.arange(N, dtype=jnp.int32)
    vary0 = (top.sum() + side.sum() + len1 + len2).astype(jnp.int32) * 0
    diag0 = jnp.where(j_idx == 0, jnp.int32(0), NEG_INF) + vary0
    prev2_0 = jnp.full((N,), NEG_INF, jnp.int32) + vary0

    def step(carry, kk):
        prev, prev2 = carry
        i_idx = kk - j_idx
        valid = (i_idx >= 0) & (i_idx <= A)
        interior = valid & (j_idx >= 1) & (i_idx >= 1)

        ch_top = jax.lax.dynamic_slice(top_ext, (N + A - kk,), (N,))
        sub = jnp.where(ch_top == side_sh, m, -k)
        prev_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev[:-1]])
        prev2_sh = jnp.concatenate([jnp.full((1,), NEG_INF, jnp.int32), prev2[:-1]])
        score = jnp.maximum(
            jnp.maximum(prev2_sh + sub, prev_sh - d), prev - d
        )
        score = jnp.where(interior, score, NEG_INF)
        score = jnp.where(valid & (j_idx == 0), -kk * d, score)
        score = jnp.where(valid & (i_idx == 0), -kk * d, score)

        emit = jax.lax.dynamic_index_in_dim(score, len2, keepdims=False)
        return (score, prev), emit

    ks = jnp.arange(1, K, dtype=jnp.int32)
    _, ys = jax.lax.scan(step, (diag0, prev2_0), ks)  # ys[kk-1], kk=1..K-1

    # H[len2, i] for i >= 1 is ys[len2 + i - 1]; H[len2, 0] = -len2*d
    row_tail = jax.lax.dynamic_slice(ys, (len2,), (A,)) if A > 0 else ys[:0]
    row0 = (-len2 * d)[None]
    return jnp.concatenate([row0, row_tail])
