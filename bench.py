"""Benchmark harness: DP-fill throughput and end-to-end pair rates.

Default (driver contract): the NORTH-STAR rows — config-2 flat fill,
banded 10 kb score fill, the 2-bit greedy arrows feed, config-3
end-to-end (median of 3 with spread), the config-5 tiled fill, and the
SW/Gotoh/overlap full-alignment rates at 128x3kb (the one-pass banded
traceback engines) — each as its own JSON line, then ONE final summary
JSON line whose
``rows`` field embeds every measurement (so the driver's parsed record
carries the whole round state, VERDICT r2 item 2).  Baseline: the
reference C binary fills at 10.7 MCUPS single-threaded (BASELINE.md;
measured, 1k x 1k pair).

``--all`` emits one JSON line per measurable PERF.md row (kernels,
end-to-end configs 2/3, variants, the sharded path, huge pairs) —
the scaling harness VERDICT r1 item 3 asked for.  ``--mesh N`` sizes
the data-parallel mesh (defaults to every visible device).

Methodology (kernel rows): the kernel is dispatched inside a
sequentially-dependent ``lax.scan`` with per-rep input perturbation
(neither XLA loop hoisting nor async-dispatch artifacts can fake the
timing); one host round-trip is subtracted via a min-of-5 null
calibration — the TPU sits behind a ~27 ms tunnel.  End-to-end rows are
wall-clock over one warm call (they include host encode/strings work,
so the scan trick does not apply).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

BASELINE_GCUPS = 0.0107  # reference: 10.7 MCUPS (BASELINE.md)


def _rand_batch(jnp, rng, nb, L):
    import jax

    tops = jnp.asarray(rng.integers(65, 69, (nb, L)), jnp.int32)
    sides = jnp.asarray(rng.integers(65, 69, (nb, L)), jnp.int32)
    lens = np.full((nb,), L, np.int32)
    tops, sides = jax.device_put((tops, sides))
    return tops, sides, lens


def _timed_scan(fill_call, tops, reps):
    """Best-of-3 of a sequentially-dependent scan, RTT-subtracted."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(tops):
        def step(carry, _):
            t = tops.at[0, 0].set(carry & 3)
            return fill_call(t).sum().astype(jnp.int32), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(reps))
        return acc

    @jax.jit
    def null(tops):
        return tops[0, 0]

    np.asarray(many(tops))
    np.asarray(null(tops))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.time()
        np.asarray(null(tops))
        rtt = min(rtt, time.time() - t0)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(many(tops))
        best = min(best, time.time() - t0)
    return max((best - rtt) / reps, 1e-9)


def _emit(metric, value, unit, vs_baseline=None):
    line = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = vs_baseline
    print(json.dumps(line), flush=True)


def bench_config2(on_tpu, emit=True):
    """BASELINE config 2: 10240 x 150 bp score-only, through the
    production score router (fill_auto: row-sweep at tuned knobs when
    it fits, else flat/banded)."""
    import jax
    import jax.numpy as jnp

    NB, L = 10240, 150
    reps = 100 if on_tpu else 3
    rng = np.random.default_rng(0)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    if on_tpu:
        # the production score router (fill_auto) — the row tracks
        # whatever engine align_batch's score path actually takes
        from nw_tpu.ops.fill_auto import fill_scores_auto

        def fill_call(t):
            return fill_scores_auto(t, sides, lens, lens, 2, 1, 1,
                                    platform="tpu")
    else:
        from nw_tpu.ops.fill_scan import fill_scores_batch

        def fill_call(t):
            return fill_scores_batch(t, sides, 2, 1, 1, lens, lens)

    per_call = _timed_scan(fill_call, tops, reps)
    gcups = NB * L * L / per_call / 1e9
    platform = jax.devices()[0].platform
    if emit:
        _emit(
            f"DP fill throughput, {NB}x{L}bp pairs, score-only, 1 chip ({platform})",
            round(gcups, 2), "GCUPS", round(gcups / BASELINE_GCUPS, 1),
        )
    return gcups


def bench_banded_scores(L=10240, NB=128, reps=10):
    """Banded kernel score-only at long lengths (the 10 kb regime)."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    rng = np.random.default_rng(1)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    def fill_call(t):
        return fill_scores_banded_batch(t, sides, lens, lens, 2, 1, 1)

    per_call = _timed_scan(fill_call, tops, reps)
    gcups = NB * L * L / per_call / 1e9
    _emit(
        f"DP fill throughput, {NB}x{L//1024}kb pairs, score-only, banded kernel",
        round(gcups, 2), "GCUPS", round(gcups / BASELINE_GCUPS, 1),
    )
    return gcups


def bench_arrows_150(NB=10240, L=150, reps=20):
    """3-bit tie-mask arrows fill (packed words) at 150 bp — the
    count/enumeration feed (single-band banded, flat layout)."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_pallas_banded import fill_arrows_banded_single

    rng = np.random.default_rng(2)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    def fill_call(t):
        w, s = fill_arrows_banded_single(t, sides, lens, lens, 2, 1, 1)
        return s + w[0, 0]

    per_call = _timed_scan(fill_call, tops, reps)
    gcups = NB * L * L / per_call / 1e9
    _emit(
        f"arrows fill (3-bit packed), {NB}x{L}bp", round(gcups, 2), "GCUPS",
        round(gcups / BASELINE_GCUPS, 1),
    )
    return gcups


def bench_greedy2_150(NB=10240, L=150, reps=50):
    """2-bit greedy arrows fill at 150 bp — the traceback feed
    (VERDICT r2 item 3: 16 cells/word, greedy direction only).  Tracks
    the engine align_batch's strings route takes: row-sweep when
    enabled, else the single-band diagonal-major kernel."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_auto import _rowsweep_enabled

    rng = np.random.default_rng(2)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    if _rowsweep_enabled():
        from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
        from nw_tpu.ops.fill_auto import rowsweep_pick

        rows, groups = rowsweep_pick("greedy", L, L, NB)

        def fill_call(t):
            w, s = fill_greedy_rowsweep_batch(
                t, sides, lens, lens, 2, 1, 1, rows=rows, groups=groups
            )
            return s + w[0, 0]
    else:
        from nw_tpu.ops.fill_pallas_banded import fill_greedy_banded_single

        def fill_call(t):
            w, s = fill_greedy_banded_single(t, sides, lens, lens, 2, 1, 1)
            return s + w[0, 0]

    per_call = _timed_scan(fill_call, tops, reps)
    gcups = NB * L * L / per_call / 1e9
    _emit(
        f"greedy arrows fill (2-bit packed), {NB}x{L}bp", round(gcups, 2),
        "GCUPS", round(gcups / BASELINE_GCUPS, 1),
    )
    return gcups


def bench_scores_counts_banded(L=10240, NB=128, reps=5):
    import jax.numpy as jnp

    from nw_tpu.ops.fill_pallas_banded import fill_scores_counts_banded_batch

    rng = np.random.default_rng(3)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    def fill_call(t):
        s, c = fill_scores_counts_banded_batch(t, sides, lens, lens, 2, 1, 1)
        return s + c.astype(jnp.int32)

    per_call = _timed_scan(fill_call, tops, reps)
    gcups = NB * L * L / per_call / 1e9
    _emit(
        f"fused score+count (banded, -q -s), {NB}x{L//1024}kb",
        round(gcups, 2), "GCUPS", round(gcups / BASELINE_GCUPS, 1),
    )
    return gcups


def bench_config3(NB=256, L=10240, trials=9):
    """BASELINE config 3: long pairs, arrows + traceback + strings +
    counts, end-to-end wall clock (banded checkpointed engine).

    Median of ``trials`` warm runs with the spread reported — one
    sample hid a 1.5x run-to-run swing (VERDICT r2 weak 2)."""
    from nw_tpu.models.needleman_wunsch import align_batch

    rng = np.random.default_rng(4)
    pairs = [
        (
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
        )
        for _ in range(NB)
    ]
    # warm at FULL batch size through the strings pass: a half-size warm
    # takes the one-shot (non-pipelined) path, so trial 1 paid the
    # pipelined programs' compile and the reported median sagged ~2x
    r = align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
    r.alignment_strings()
    rates = []
    for _ in range(trials):
        t0 = time.time()
        r = align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
        r.alignment_strings()
        rates.append(NB / (time.time() - t0))
    rates.sort()
    med = statistics.median(rates)
    _emit(
        f"end-to-end {NB}x{L//1024}kb: fill+traceback+strings+counts "
        f"(config 3; median of {trials}, min {rates[0]:.0f} max {rates[-1]:.0f})",
        round(med, 1), "pairs/s",
    )
    return med


def bench_e2e_150(NB=4096, L=150):
    """Short-read end-to-end: strings + counts."""
    from nw_tpu.models.needleman_wunsch import align_batch

    rng = np.random.default_rng(5)
    pairs = [
        (
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
        )
        for _ in range(NB)
    ]
    align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
    t0 = time.time()
    r = align_batch(pairs, 2, 1, 1, traceback_strings=True, count=True)
    r.alignment_strings()
    dt = time.time() - t0
    _emit(
        f"end-to-end {NB}x{L}bp: strings+counts", round(NB / dt, 0), "pairs/s"
    )
    return NB / dt


def bench_variant_e2e_150(NB=4096, L=150, trials=3):
    """Variant FULL alignments at short reads, end-to-end (strings,
    start positions): the sw/affine/overlap align_batch paths."""
    from nw_tpu.models.affine import affine_align_batch
    from nw_tpu.models.overlap import overlap_align_batch
    from nw_tpu.models.smith_waterman import sw_align_batch

    rng = np.random.default_rng(6)
    pairs = [
        (
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
        )
        for _ in range(NB)
    ]
    for name, call in (
        ("SW", lambda: sw_align_batch(pairs, 2, 1, 1)),
        ("Gotoh", lambda: affine_align_batch(pairs, 2, 1, 3, 1)),
        ("Overlap", lambda: overlap_align_batch(pairs, 2, 1, 1)),
    ):
        call()
        rates = []
        for _ in range(trials):
            t0 = time.time()
            call()
            rates.append(NB / (time.time() - t0))
        rates.sort()
        _emit(
            f"{name} full alignments, {NB}x{L}bp (e2e)",
            round(statistics.median(rates), 0), "pairs/s",
        )


def bench_sharded(mesh_devices=None, NB=10240, L=150, reps=20):
    """Data-parallel mesh path (config 4 analogue; 1 chip here, the
    same code drives N-chip meshes)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from nw_tpu.parallel.data_parallel import align_batch_sharded

    devs = jax.devices()[:mesh_devices] if mesh_devices else jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    rng = np.random.default_rng(6)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)
    lj = jnp.asarray(lens)

    def fill_call(t):
        sc, _ = align_batch_sharded(
            t, sides, lj, lj, m=2, k=1, d=1, mesh=mesh, with_counts=False
        )
        return sc

    per_call = _timed_scan(fill_call, tops, reps)
    rate = NB / per_call
    gcups = NB * L * L / per_call / 1e9
    _emit(
        f"sharded score path, {NB}x{L}bp over {len(devs)}-device mesh",
        round(gcups, 2), "GCUPS", round(gcups / BASELINE_GCUPS, 1),
    )
    return rate


def bench_huge_pair(L=100_000):
    """Single huge pair: exact first-emission traceback (config 5 scale,
    1 chip)."""
    from nw_tpu.models.needleman_wunsch import NWAligner

    rng = np.random.default_rng(7)
    s1 = rng.integers(65, 69, L).astype(np.uint8).tobytes()
    s2 = rng.integers(65, 69, L).astype(np.uint8).tobytes()
    al = NWAligner()
    al.align_huge(s1, s2)  # warm (same shape: exclude compile)
    t0 = time.time()
    al.align_huge(s1, s2)
    dt = time.time() - t0
    _emit(
        f"exact traceback, 1x{L//1000}kb pair", round(dt, 2), "s"
    )
    return dt


def bench_strips(L=100_000, reps=3):
    """Single-pair score fill via the strips-in-slots pipeline (1024
    column strips of ONE pair across the vector slots; fill_strips).

    Timed through ``_timed_scan`` (sequentially-dependent reps inside
    one jitted scan): the old single-call wall-clock-minus-RTT scheme
    could go non-positive when XLA served a hoisted result, publishing
    a clamped 1e10 GCUPS sentinel (ADVICE r4).  Returns None (row
    skipped, named in the summary) if the measurement still lands
    below a 1 ms/rep sanity floor."""
    import jax.numpy as jnp

    from nw_tpu.ops.encode import encode
    from nw_tpu.ops.fill_strips import strips_score

    rng = np.random.default_rng(9)
    t = jnp.asarray(encode(rng.integers(65, 69, L).astype(np.uint8).tobytes()))
    s = jnp.asarray(encode(rng.integers(65, 69, L).astype(np.uint8).tobytes()))
    t2d = t[None, :]

    def fill_call(tp):
        return strips_score(tp[0], s, 2, 1, 1)

    per_call = _timed_scan(fill_call, t2d, reps)
    if per_call < 1e-3:
        # a 100kb x 100kb fill cannot finish in <1 ms on this chip;
        # the measurement is invalid — do not publish a bogus rate
        _emit(
            f"single-pair score fill (strips pipeline), 1x{L//1000}kb",
            None, "GCUPS (measurement invalid: sub-RTT timing)",
        )
        return None
    gcups = L * L / per_call / 1e9
    _emit(
        f"single-pair score fill (strips pipeline), 1x{L//1000}kb",
        round(gcups, 1), "GCUPS", round(gcups / BASELINE_GCUPS, 1),
    )
    return gcups


def bench_variant_tracebacks(NB=128, L=3072, trials=5):
    """Full SW / Gotoh / overlap alignments on long pairs (banded
    one-pass traceback engines).  Median of ``trials`` warm runs with
    the spread reported (single samples swung with tunnel load, same
    as config 3 — VERDICT r2 weak 2).  Returns (sw, gotoh, overlap)
    pairs/s so the driver-default summary can embed them."""
    from nw_tpu.models.affine import affine_align_batch
    from nw_tpu.models.overlap import overlap_align_batch
    from nw_tpu.models.smith_waterman import sw_align_batch

    rng = np.random.default_rng(9)
    pairs = [
        (
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
            rng.integers(65, 69, L).astype(np.uint8).tobytes(),
        )
        for _ in range(NB)
    ]
    rates = []
    # warm with the SAME batch shape: a different batch size is a
    # different compiled program, so the old 32-pair warm call left the
    # timed run paying a full compile (bench measured 45 pairs/s where
    # the warm engine does ~470)
    for name, run in (
        ("SW", lambda: sw_align_batch(pairs, 2, 1, 1)),
        ("Gotoh", lambda: affine_align_batch(pairs, 2, 1, 3, 1)),
        ("Overlap", lambda: overlap_align_batch(pairs, 2, 1, 1)),
    ):
        run()
        samples = []
        for _ in range(trials):
            t0 = time.time()
            run()
            samples.append(NB / (time.time() - t0))
        samples.sort()
        med = round(statistics.median(samples), 1)
        _emit(
            f"{name} full alignments, {NB}x{L//1024}kb (banded traceback;"
            f" median of {trials}, min {samples[0]:.0f}"
            f" max {samples[-1]:.0f})",
            med, "pairs/s",
        )
        rates.append(med)
    return tuple(rates)


def bench_huge_sharded(L=100_000, mesh_devices=None):
    """Config 5 fill rate per device (fold-chunk engine; 1 chip here —
    the same program pipelines over N-device meshes)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from nw_tpu.parallel.huge_pair import huge_pair_score_sharded

    devs = jax.devices()[:mesh_devices] if mesh_devices else jax.devices()
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.default_rng(11)
    top = jnp.asarray(rng.integers(65, 69, L), jnp.int32)
    side = jnp.asarray(rng.integers(65, 69, L), jnp.int32)
    huge_pair_score_sharded(top, side, 2, 1, 1, mesh)  # warm
    t0 = time.time()
    huge_pair_score_sharded(top, side, 2, 1, 1, mesh)
    dt = time.time() - t0
    rate = L * L / dt / 1e9 / len(devs)
    _emit(
        f"config-5 tiled fill, 1x{L//1000}kb over {len(devs)}-device mesh",
        round(rate, 1), "GCUPS/device",
    )
    return rate


def bench_huge_walk(L=100_000):
    """Config-5 END-TO-END exact alignment (fill + segment-relay walk +
    host stitch) of ONE L x L pair on one chip — a geometry the
    monolithic engine's 8-bit arrow stack cannot even hold in HBM at
    100 kb (20 GB); the register-blocked engine's 2-bit greedy words
    (2.5 GB) make it routine."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from nw_tpu.parallel.huge_pair import huge_pair_align_sharded

    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    rng = np.random.default_rng(13)
    top = jnp.asarray(rng.integers(65, 69, L), jnp.int32)
    side = jnp.asarray(rng.integers(65, 69, L), jnp.int32)
    huge_pair_align_sharded(top, side, 2, 1, 1, mesh)  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        huge_pair_align_sharded(top, side, 2, 1, 1, mesh)
        ts.append(time.time() - t0)
    dt = statistics.median(ts)
    _emit(
        f"config-5 exact alignment e2e (fill+relay walk+stitch),"
        f" 1x{L//1000}kb, 1 chip",
        round(dt, 3), "s",
    )
    return dt


def bench_variants(NB=10240, L=150, reps=20):
    """Variant score kernels at 150 bp, tracking the production route
    (row-sweep engines at tuned knobs when enabled, else the flat
    wavefront kernels)."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_auto import rowsweep_pick

    rng = np.random.default_rng(8)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)

    rs = rowsweep_pick("sw", L, L, NB)
    if rs is not None:
        from nw_tpu.ops.variants_rowsweep import sw_scores_rowsweep_batch

        sw_call = lambda t: sw_scores_rowsweep_batch(
            t, sides, lens, lens, 2, 1, 1, rows=rs[0], groups=rs[1]
        )
    else:
        from nw_tpu.ops.variants_pallas import sw_scores_pallas_batch

        sw_call = lambda t: sw_scores_pallas_batch(
            t, sides, lens, lens, 2, 1, 1
        )
    per = _timed_scan(sw_call, tops, reps)
    _emit(
        f"Smith-Waterman score fill, {NB}x{L}bp",
        round(NB * L * L / per / 1e9, 2), "GCUPS",
    )

    ra = rowsweep_pick("affine", L, L, NB)
    if ra is not None:
        from nw_tpu.ops.variants_rowsweep import (
            affine_scores_rowsweep_batch,
        )

        af_call = lambda t: affine_scores_rowsweep_batch(
            t, sides, lens, lens, 2, 1, 3, 1, rows=ra[0], groups=ra[1]
        )
    else:
        from nw_tpu.ops.variants_pallas import affine_scores_pallas_batch

        af_call = lambda t: affine_scores_pallas_batch(
            t, sides, lens, lens, 2, 1, 3, 1
        )
    per = _timed_scan(af_call, tops, reps)
    _emit(
        f"Gotoh affine score fill, {NB}x{L}bp",
        round(NB * L * L / per / 1e9, 2), "GCUPS",
    )

    from nw_tpu.ops.variants_rowsweep import overlap_scores_rowsweep_batch

    ro = rowsweep_pick("overlap", L, L, NB) or (8, 1)
    per = _timed_scan(
        lambda t: overlap_scores_rowsweep_batch(
            t, sides, lens, lens, 2, 1, 1, rows=ro[0], groups=ro[1]
        ),
        tops, reps,
    )
    _emit(
        f"Overlap (semi-global) score fill, {NB}x{L}bp",
        round(NB * L * L / per / 1e9, 2), "GCUPS",
    )


def bench_variants_banded(NB=128, L=10240, reps=5):
    """Banded variant score kernels at the 10 kb regime (the PERF.md
    SW/Gotoh banded rows, regenerated rather than hand-run; overlap
    rides the same machinery)."""
    import jax.numpy as jnp

    from nw_tpu.ops.variants_banded import (
        affine_scores_banded_batch,
        overlap_scores_banded_batch,
        sw_scores_banded_batch,
    )

    rng = np.random.default_rng(9)
    tops, sides, lens = _rand_batch(jnp, rng, NB, L)
    for name, fn in (
        ("Smith-Waterman", lambda t: sw_scores_banded_batch(
            t, sides, lens, lens, 2, 1, 1)),
        ("Gotoh affine", lambda t: affine_scores_banded_batch(
            t, sides, lens, lens, 2, 1, 3, 1)),
        ("Overlap (semi-global)", lambda t: overlap_scores_banded_batch(
            t, sides, lens, lens, 2, 1, 1)),
    ):
        per = _timed_scan(fn, tops, reps)
        _emit(
            f"{name} score fill (banded), {NB}x{L//1024}kb",
            round(NB * L * L / per / 1e9, 2), "GCUPS",
        )


def main() -> None:
    # persistent compile cache: a fresh bench process otherwise pays
    # ~4-5 min of XLA compiles before the first row (the config-2 scan
    # alone is ~270 s cold) — with the cache, repeat runs start timing
    # within seconds
    from nw_tpu.cli import enable_default_compile_cache

    enable_default_compile_cache()

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    args = sys.argv[1:]
    if not on_tpu:
        bench_config2(on_tpu)
        return
    if "--all" not in args:
        # driver default: the north-star rows, then a summary line whose
        # ``rows`` field embeds them all (the driver parses the LAST
        # line; one config-2 number hid every round-2 win — VERDICT r2
        # item 2).  config 2 runs AFTER the other four north-star rows
        # (its flat kernel's Mosaic compile alone is 300-500 s cold and
        # cache-resistant, and must not starve them under a driver
        # timeout) but BEFORE the variant/strips/e2e extras, which are
        # the right rows to lose to the budget.
        #
        # Time budget (``NW_TPU_BENCH_BUDGET`` seconds, default 1500):
        # every cold run pays minutes of XLA compiles, and the summary
        # line MUST still print before the driver's own timeout — once
        # the budget is spent, remaining rows are skipped (named in the
        # summary's ``skipped`` field, never silently — PERF.md rule).
        import os

        budget = float(os.environ.get("NW_TPU_BENCH_BUDGET", "1500"))
        t_start = time.time()
        rows = {}
        skipped = []

        def within(name, fn, *, first=False, expected=60.0):
            # reserve headroom per row (ADVICE r4): a row that STARTS
            # just under the budget can still run long past it and
            # starve the summary line under the driver timeout, so the
            # gate is elapsed + expected cold cost, not elapsed alone
            if not first and time.time() - t_start + expected > budget:
                skipped.append(name)
                return None
            return fn()

        v = within(
            "banded_score_128x10kb_GCUPS",
            lambda: round(bench_banded_scores(), 2), first=True,
        )
        rows["banded_score_128x10kb_GCUPS"] = v
        v = within(
            "greedy2_arrows_10240x150bp_GCUPS",
            lambda: round(bench_greedy2_150(), 2), expected=90,
        )
        if v is not None:
            rows["greedy2_arrows_10240x150bp_GCUPS"] = v
        v = within(
            "config3_e2e_median_pairs_per_s",
            lambda: round(bench_config3(), 1), expected=180,
        )
        if v is not None:
            rows["config3_e2e_median_pairs_per_s"] = v
        v = within(
            "config5_tiled_fill_100kb_GCUPS_per_dev",
            lambda: round(bench_huge_sharded(), 1), expected=90,
        )
        if v is not None:
            rows["config5_tiled_fill_100kb_GCUPS_per_dev"] = v
        v = within(
            "config2_score_150bp_GCUPS",
            lambda: round(bench_config2(on_tpu), 2), expected=520,
        )
        if v is not None:
            rows["config2_score_150bp_GCUPS"] = v
        v = within(
            "variant_tracebacks_128x3kb", bench_variant_tracebacks,
            expected=150,
        )
        if v is not None:
            (
                rows["sw_traceback_128x3kb_pairs_per_s"],
                rows["gotoh_traceback_128x3kb_pairs_per_s"],
                rows["overlap_traceback_128x3kb_pairs_per_s"],
            ) = v
        v = within(
            "strips_single_pair_100kb_GCUPS", bench_strips, expected=90,
        )
        if v is not None:
            rows["strips_single_pair_100kb_GCUPS"] = round(v, 1)
        v = within(
            "e2e_strings_counts_4096x150bp_pairs_per_s",
            lambda: round(bench_e2e_150(), 0), expected=90,
        )
        if v is not None:
            rows["e2e_strings_counts_4096x150bp_pairs_per_s"] = v
        # LAST: its ~2.5 GB walk-word stack churns the HBM allocator
        # and measurably slows any big-allocation row that follows in
        # the same process (SW 1599 -> 1242 pairs/s measured)
        v = within(
            "config5_align_e2e_100kb_s",
            lambda: round(bench_huge_walk(), 3), expected=90,
        )
        if v is not None:
            rows["config5_align_e2e_100kb_s"] = v
        head = rows["banded_score_128x10kb_GCUPS"]
        line = {
            "metric": "DP fill throughput, 128x10kb pairs, score-only, "
            "banded kernel, 1 chip (tpu)",
            "value": head,
            "unit": "GCUPS",
            "vs_baseline": round(head / BASELINE_GCUPS, 1),
            "rows": rows,
        }
        if skipped:
            line["skipped"] = skipped
        print(json.dumps(line), flush=True)
        return

    mesh_n = None
    if "--mesh" in args:
        mesh_n = int(args[args.index("--mesh") + 1])
    bench_config2(on_tpu)
    bench_banded_scores()
    bench_banded_scores(L=2048, NB=128, reps=20)
    bench_arrows_150()
    bench_greedy2_150()
    bench_scores_counts_banded()
    bench_config3()
    bench_e2e_150()
    bench_variant_e2e_150()
    bench_sharded(mesh_n)
    bench_variants()
    bench_variants_banded()
    bench_variant_tracebacks()
    bench_huge_pair()
    bench_strips()
    bench_huge_sharded(mesh_devices=mesh_n)
    bench_huge_walk()


if __name__ == "__main__":
    main()
