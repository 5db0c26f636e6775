"""Stage profile for BASELINE config 3 (256x10kb fill+traceback+strings).

Splits the end-to-end wall clock into the pipelined device half
(``align_batch``: banded checkpointed fill + group re-fill + walks +
on-device stitch, dispatch overlapped with finalize) and the host
string-materialization half (``alignment_strings``: native
runtime/cc/nwstrings.cc pass).  Run when a bench.py config-3 median
looks off: an idle tunnel measures ~370 pairs/s with ~0.62 s device /
~0.07 s strings; a busy shared tunnel sags the device half (the
per-chunk ops4 fetches ride the ~27 ms link), which is run-environment
noise, not an engine regression.  Reference hot loops this path
reproduces: needleman-wunsch.c:395-626 (fill), :209-331 (walk).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nw_tpu.cli import enable_default_compile_cache

enable_default_compile_cache()

from nw_tpu.models.needleman_wunsch import align_batch

NB, L = 256, 10240


def main() -> None:
    rng = np.random.default_rng(4)
    pairs = [
        (
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
        )
        for _ in range(NB)
    ]

    r = align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
    r.alignment_strings()  # warm at full batch size (pipelined programs)

    for trial in range(5):
        t0 = time.time()
        r = align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
        t1 = time.time()
        r.alignment_strings()
        t2 = time.time()
        print(
            f"trial {trial}: align_batch {t1 - t0:.3f}s  "
            f"strings {t2 - t1:.3f}s  total {t2 - t0:.3f}s  "
            f"-> {NB / (t2 - t0):.1f} pairs/s"
        )


if __name__ == "__main__":
    main()
