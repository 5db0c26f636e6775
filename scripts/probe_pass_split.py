"""Probe: config-3 device-time split — pass-1 score sweep vs the full
walk program (default engine), 256x10kb, on the chip.

Round-4 outcome of the round-3 candidates this probe motivated
(full decomposition + measurements in PERF.md "Round 4"):

1. uint8 upload: DONE (ops/encode.encode_batch_u8) — removed the
   1.5x run-to-run variance and most of the host half.
2. cheaper walk: the per-cell walk turned out to be only ~15% of the
   program (a 256-lane gather costs ~4 us); a run-skip engine exists
   (NW_TPU_WALK_ENGINE=runs) but loses on refill byte-emission cost.
3. pass overlap: superseded by the ONE-PASS engine (fused
   score+counts+2-bit-words sweep, no re-fill) — the compiled
   default; config 3 went 307 (r3) -> ~577 pairs/s.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nw_tpu.cli import enable_default_compile_cache

enable_default_compile_cache()

import jax
import jax.numpy as jnp

from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch
from nw_tpu.ops.banded_traceback import traceback_banded_dispatch

NB, L = 256, 10240
# Geometry MUST mirror traceback_banded_dispatch's pass-1 defaults
# (band_rows=96, chunk=192) so "t_full - t_score" subtracts a
# like-for-like pass 1 (ADVICE r3 item 3).
BAND_ROWS, CHUNK = 96, 192


def timeit(fn, n=3):
    fn(0)  # warm
    best = float("inf")
    for i in range(1, n + 1):
        t0 = time.time()
        fn(i)
        best = min(best, time.time() - t0)
    return best


def main():
    rng = np.random.default_rng(4)
    tops = jnp.asarray(rng.integers(65, 69, (NB, L)), jnp.int32)
    sides = jnp.asarray(rng.integers(65, 69, (NB, L)), jnp.int32)
    lens = np.full((NB,), L, np.int32)
    tops, sides = jax.device_put((tops, sides))

    # NB: jax.block_until_ready is a no-op under the axon tunnel platform —
    # synchronize by fetching (np.asarray), like bench.py does.
    def score_only(i):
        t = tops.at[0, 0].set(65 + (i & 3))
        s = fill_scores_banded_batch(
            t, sides, lens, lens, 2, 1, 1, band_rows=BAND_ROWS, chunk=CHUNK
        )
        np.asarray(s)

    def full_walk(i):
        t = tops.at[0, 0].set(65 + (i & 3))
        scores, counts, ops4, total = traceback_banded_dispatch(
            t, sides, lens, lens, 2, 1, 1
        )
        np.asarray(scores), np.asarray(ops4), np.asarray(total)

    t_score = timeit(score_only)
    t_full = timeit(full_walk)
    cells = NB * L * L
    print(f"pass1-equivalent score sweep: {t_score:.3f}s ({cells/t_score/1e9:.0f} GCUPS)")
    print(f"full two-pass walk program:   {t_full:.3f}s -> {NB/t_full:.0f} pairs/s device")
    print(f"implied pass2 (refill+walk):  {t_full - t_score:.3f}s")


if __name__ == "__main__":
    main()
