"""Hardware (rows, groups) sweep for the row-sweep engine family.

Times the score kernel (fill_rowsweep) and the 2-bit greedy arrows
kernel (arrows_rowsweep) at the config-2 shape over the ILP knob grid,
with bench.py's methodology (sequentially-dependent scan + per-rep
perturbation + RTT subtraction), and prints a GCUPS table plus the
winning (rows, groups) per engine — the numbers that decide the
production defaults in needleman_wunsch.align_batch's row-sweep routes.

Run on the real chip: ``python scripts/rowsweep_tune.py``.
NB = 12288 keeps every groups block quantum (1024/2048/4096) exact.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import _rand_batch, _timed_scan
    from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
    from nw_tpu.ops.fill_rowsweep import (
        fill_scores_counts_rowsweep_batch,
        fill_scores_rowsweep_batch,
    )
    from nw_tpu.ops.variants_rowsweep import (
        affine_scores_rowsweep_batch,
        overlap_scores_rowsweep_batch,
        sw_scores_rowsweep_batch,
    )

    from nw_tpu.ops.fill_scan import fill_scores_batch
    from nw_tpu.models.overlap import overlap_scores_scan_batch
    from nw_tpu.ops.variants_pallas import (
        affine_scores_pallas_batch,
        sw_scores_pallas_batch,
    )

    platform = jax.devices()[0].platform
    NB, L = 12288, 150
    reps = 50 if platform == "tpu" else 2
    rng = np.random.default_rng(5)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)
    lj = jnp.asarray(lens)
    cells = NB * L * L
    # every timed config is also bit-checked against the scan oracle on
    # the SAME batch — a wrong-but-fast geometry must not win the sweep
    want = np.asarray(fill_scores_batch(tops, sides, 2, 1, 1, lj, lj))
    want_sw = np.asarray(
        sw_scores_pallas_batch(tops, sides, lens, lens, 2, 1, 1,
                               interpret=platform != "tpu")
    )
    want_af = np.asarray(
        affine_scores_pallas_batch(tops, sides, lens, lens, 2, 1, 3, 1,
                                   interpret=platform != "tpu")
    )
    want_ov = np.asarray(
        overlap_scores_scan_batch(tops, sides, 2, 1, 1, lj, lj)
    )

    grid = [(r, g) for r in (4, 8, 16) for g in (1, 2, 4)]
    best = {}

    def feasible(name, r, g):
        """Only configs the production router (fill_auto.rowsweep_pick)
        would dispatch UNSHRUNKEN at this geometry may win: a winner
        outside the VMEM caps gets its groups halved at route time and
        lands on an untimed configuration."""
        from nw_tpu.ops.fill_auto import (
            GREEDY_MAX_SIDE_X_GROUPS,
            ROWSWEEP_MAX_SIDE,
            ROWSWEEP_MAX_TOP,
        )

        if name == "greedy":
            return L * g <= GREEDY_MAX_SIDE_X_GROUPS
        return L * g <= ROWSWEEP_MAX_SIDE and L * g <= ROWSWEEP_MAX_TOP
    for name, make, scores_of, ref in (
        (
            "score",
            lambda r, g: lambda t: fill_scores_rowsweep_batch(
                t, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            lambda r, g: fill_scores_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            want,
        ),
        (
            "greedy",
            lambda r, g: lambda t: (
                lambda ws: ws[1] + ws[0][0, 0]
            )(
                fill_greedy_rowsweep_batch(
                    t, sides, lens, lens, 2, 1, 1, rows=r, groups=g
                )
            ),
            lambda r, g: fill_greedy_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            )[1],
            want,
        ),
        (
            "counts",
            lambda r, g: lambda t: (
                lambda sc: sc[0] + sc[1].astype(jnp.int32)
            )(
                fill_scores_counts_rowsweep_batch(
                    t, sides, lens, lens, 2, 1, 1, rows=r, groups=g
                )
            ),
            lambda r, g: fill_scores_counts_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            )[0],
            want,
        ),
        (
            "sw",
            lambda r, g: lambda t: sw_scores_rowsweep_batch(
                t, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            lambda r, g: sw_scores_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            want_sw,
        ),
        (
            "affine",
            lambda r, g: lambda t: affine_scores_rowsweep_batch(
                t, sides, lens, lens, 2, 1, 3, 1, rows=r, groups=g
            ),
            lambda r, g: affine_scores_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 3, 1, rows=r, groups=g
            ),
            want_af,
        ),
        (
            "overlap",
            lambda r, g: lambda t: overlap_scores_rowsweep_batch(
                t, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            lambda r, g: overlap_scores_rowsweep_batch(
                tops, sides, lens, lens, 2, 1, 1, rows=r, groups=g
            ),
            want_ov,
        ),
    ):
        print(f"== {name} kernel, {NB}x{L}bp ({platform}) ==", flush=True)
        top = (0.0, None)
        for r, g in grid:
            try:
                got = np.asarray(scores_of(r, g))
                if not (got == ref).all():
                    print(f"rows={r:2d} groups={g}  WRONG OUTPUT — skipped",
                          flush=True)
                    continue
                per_call = _timed_scan(make(r, g), tops, reps)
            except Exception as e:  # infeasible geometry: report, move on
                print(f"rows={r:2d} groups={g}  FAILED: {type(e).__name__}",
                      flush=True)
                continue
            gcups = cells / per_call / 1e9
            ok = feasible(name, r, g)
            note = "" if ok else "  (outside the route's VMEM caps)"
            print(f"rows={r:2d} groups={g}  {gcups:8.1f} GCUPS{note}",
                  flush=True)
            if ok and gcups > top[0]:
                top = (gcups, (r, g))
        best[name] = top
        print(f"best {name}: rows,groups={top[1]}  {top[0]:.1f} GCUPS",
              flush=True)

    # persist the winners: every later process's rowsweep_knobs() reads
    # them (the reference's wished-for profile-driven auto-tuning,
    # README:209-214, done by measuring the actual chip)
    if platform == "tpu":
        import json

        from nw_tpu.ops.fill_auto import tuned_file_path

        path = tuned_file_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "platform": platform,
            "sweep_shape": f"{NB}x{L}bp",
            "engines": {
                name: list(top[1])
                for name, top in best.items()
                if top[1] is not None
            },
            "gcups": {
                name: round(top[0], 1)
                for name, top in best.items()
                if top[1] is not None
            },
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"winners saved to {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
