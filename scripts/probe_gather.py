"""Probe: sequential dependent-gather cost on the v5e vs lane count.

The banded walk (ops/banded_traceback.py:_make_walk_loop) is a chain of
~20k dependent 256-lane gathers from a ~1 GB word slab.  Two round-4
candidates hinge on how a single gather's cost scales:

* If the gather is LATENCY-bound (cost ~flat in lane count), walking
  all groups in parallel (7x lanes, 7x fewer sequential steps) divides
  walk time ~7x.
* If it is ELEMENT-SERIAL (cost ~linear in lanes), only shortening the
  per-step critical path helps.

Pass the slab as an argument (a captured-constant slab makes XLA embed
gigabytes in the program and skews the timing 100x).

Run on the chip: python scripts/probe_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

P = 1_000_000  # rows in the slab


def make_chain(L, n, spread):
    lane = np.arange(L, dtype=np.int32)

    @jax.jit
    def run(words, idx0):
        flat = words.reshape(-1)

        def body(idx, _):
            w = flat[idx * L + lane]
            # dependent next index, bounded drift (spread ~ cursor motion)
            idx = jnp.abs(idx + w % (2 * spread + 1) - spread) % P
            return idx, None

        idx, _ = jax.lax.scan(body, idx0, None, length=n)
        return idx

    return run


def main():
    n_hi, n_lo = 512, 16
    for L in (256, 1792):
        words = jnp.ones((P, L), jnp.int32)
        idx0 = jnp.asarray(np.random.default_rng(0).integers(0, P, L), jnp.int32)
        for spread, tag in ((4, "coherent"), (P // 2, "random")):
            hi = make_chain(L, n_hi, spread)
            lo = make_chain(L, n_lo, spread)
            np.asarray(hi(words, idx0)); np.asarray(lo(words, idx0))
            ts = {}
            for name, fn in (("hi", hi), ("lo", lo)):
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(fn(words, idx0))
                    best = min(best, time.time() - t0)
                ts[name] = best
            per_step = (ts["hi"] - ts["lo"]) / (n_hi - n_lo)
            print(
                f"L={L:5d} {tag:9s}: {per_step*1e6:8.2f} us/gather "
                f"({per_step/L*1e9:6.2f} ns/element)"
            )


if __name__ == "__main__":
    main()
