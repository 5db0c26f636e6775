"""Differential tests: byte-exact stdout AND stderr vs the reference C
binary (SURVEY.md §4.3 item 1).  Skipped when no reference build exists;
golden tests in test_cli.py cover the same surface standalone."""

import numpy as np
import pytest

from tests.conftest import run_ours, run_ref

# (args, stdin) cases — chosen to exercise flags, quirks, and edge cases.
CASES = [
    (["1", "1", "1"], b"GT GT"),
    (["1", "1", "1"], b"GT GA"),
    (["-l", "1", "1", "1"], b"GT GA"),
    (["1", "1", "1"], b"GAT GTA"),
    (["-s", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-q", "-s", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-q", "-l", "1", "1", "1"], b"GAT GTA"),
    (["-s", "-l", "-t", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-q", "-s", "-t", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-q", "-t", "-u", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-c", "-s", "-l", "-t", "1", "1", "1"], b"GCATGCU GATTACA"),
    (["-c", "-t", "-u", "-q", "1", "1", "1"], b"GAT GTA"),
    (["-c", "1", "1", "1"], b"GT GA"),
    (["x", "y", "z"], b"GT GA"),  # atoi garbage -> 0 0 0, tie explosion
    (["-s", "x", "y", "z"], b"GT GA"),
    (["-s", "--", "-1", "1", "1"], b"GT GA"),  # negative operand after --
    (["-s", "--", "1", "1", "-2"], b"GT GA"),  # negative gap penalty
    (["-s", "0", "5", "2"], b"AAAA AAAA"),
    (["-s", "-t", "3", "2", "1"], b"TTCATA TGCTCGTA"),
    (["-s", "1", "1", "1"], b" GT GA"),  # empty first sequence
    (["-s", "1", "1", "1"], b"G\nGATTACA\n"),  # newline separator
    (["-s", "1", "1", "1"], b"AB\tCD\textra ignored"),  # tab sep, extra input
    (["-p", "4", "-s", "1", "1", "1"], b"GCATGCU GATTACA"),  # threads accepted
    (["1", "1", "1", "-s"], b"GT GT"),  # glibc operand permutation
    # error paths
    ([], b""),
    (["1", "1"], b""),
    (["1", "1", "1", "1"], b""),
    (["-h"], b""),
    (["-p", "1", "1", "1", "1"], b"GT GT"),
    (["-p", "x", "1", "1", "1"], b"GT GT"),
    (["-f", "/nonexistent-nw-file", "1", "1", "1"], b""),
    (["1", "1", "1"], b"GT"),
    (["1", "1", "1"], b"GT "),
    (["1", "1", "1"], b""),
    (["-z", "1", "1", "1"], b""),
]


CASES += [
    # arbitrary non-whitespace bytes are valid sequence characters
    (["-s", "1", "1", "1"], b"a+b/c a-b*c"),
    (["-l", "2", "1", "1"], b"Hello! hello?"),
    (["-s", "-l", "1", "2", "3"], b"12345 54321"),
    (["-c", "-t", "1", "1", "1"], b"A.B A,B"),
    (["-s", "1", "1", "1"], bytes([200, 201, 202]) + b" " + bytes([200, 202])),
    # extreme / degenerate params
    (["-s", "--", "-3", "-2", "-1"], b"ACGT TGCA"),
    (["-s", "1000000", "1000000", "1000000"], b"ACGT ACG"),
    (["-q", "-s", "--", "0", "0", "-1"], b"AC GT"),  # gap reward
]


@pytest.mark.parametrize("args,stdin", CASES, ids=[str(i) for i in range(len(CASES))])
def test_differential(reference_binary, args, stdin):
    rc_ref, out_ref, err_ref = run_ref(reference_binary, args, stdin)
    rc_our, out_our, err_our = run_ours(args, stdin)
    # normalize prog name in stderr (binary path vs our argv[0])
    import os

    ref_prog = os.path.basename(reference_binary).encode()
    err_ref_n = err_ref.replace(reference_binary.encode(), b"needleman-wunsch").replace(
        ref_prog, b"needleman-wunsch"
    )
    assert out_our == out_ref, f"stdout mismatch for {args} {stdin!r}"
    assert err_our == err_ref_n, f"stderr mismatch for {args} {stdin!r}"
    assert rc_our == rc_ref, f"exit code mismatch for {args} {stdin!r}"


def test_differential_random_small(reference_binary):
    """Randomized fuzzing over small pairs and scoring params
    (fixed shapes to bound jit compiles)."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        s1 = "".join(rng.choice(list("ACGT"), 8))
        s2 = "".join(rng.choice(list("ACGT"), 6))
        m, k, d = (str(int(x)) for x in rng.integers(0, 4, 3))
        args = ["-s", "-l", m, k, d]
        stdin = f"{s1} {s2}".encode()
        rc_ref, out_ref, err_ref = run_ref(reference_binary, args, stdin)
        rc_our, out_our, err_our = run_ours(args, stdin)
        assert out_our == out_ref, (s1, s2, m, k, d)
        assert err_our == err_ref.replace(b"./needleman-wunsch", b"needleman-wunsch"), (s1, s2, m, k, d)


def test_differential_table_random(reference_binary):
    """Random tables with -t -c -u: full renderer parity."""
    rng = np.random.default_rng(43)
    for trial in range(8):
        s1 = "".join(rng.choice(list("ACGT"), 5))
        s2 = "".join(rng.choice(list("ACGT"), 5))
        m, k, d = (str(int(x)) for x in rng.integers(0, 3, 3))
        args = ["-c", "-t", "-u", "-s", m, k, d]
        stdin = f"{s1} {s2}".encode()
        rc_ref, out_ref, err_ref = run_ref(reference_binary, args, stdin)
        rc_our, out_our, err_our = run_ours(args, stdin)
        assert out_our == out_ref, (s1, s2, m, k, d)


def test_differential_random_bytes(reference_binary):
    """Random printable-byte alphabets + negative params (fixed shapes)."""
    rng = np.random.default_rng(44)
    alphabet = [c for c in range(33, 127)]  # non-whitespace printable
    for trial in range(12):
        s1 = bytes(rng.choice(alphabet, 7).astype("u1").tolist())
        s2 = bytes(rng.choice(alphabet, 5).astype("u1").tolist())
        m, k, d = (str(int(x)) for x in rng.integers(-3, 4, 3))
        args = ["-s", "-l", "--", m, k, d]
        stdin = s1 + b" " + s2
        rc_ref, out_ref, err_ref = run_ref(reference_binary, args, stdin)
        rc_our, out_our, err_our = run_ours(args, stdin)
        assert out_our == out_ref, (s1, s2, m, k, d)
        assert err_our == err_ref.replace(
            b"./needleman-wunsch", b"needleman-wunsch"
        ), (s1, s2, m, k, d)


def test_differential_real_subprocess(reference_binary, tmp_path):
    """Raw-fd parity: run our CLI as an actual subprocess (C++-level
    stderr included — the in-process harness can't see it; jax/XLA
    library logging once leaked here)."""
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        NW_TPU_PLATFORM="cpu",
        PYTHONPATH=os.getcwd(),
        HOME=str(tmp_path),  # isolate the CLI's default compile cache
    )
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    code = (
        "import sys; from nw_tpu.cli import console_main; "
        "sys.argv = ['needleman-wunsch'] + sys.argv[1:]; console_main()"
    )
    # same case twice: cold (compiles + writes cache) and warm (loads
    # cached AOT executables — the path that once spewed loader errors)
    for args, stdin in [
        (["-s", "1", "1", "1"], b"GCATGCU GATTACA"),
        (["-s", "1", "1", "1"], b"GCATGCU GATTACA"),
        (["-l", "2", "1", "1"], b"GT GA"),
    ]:
        ref = subprocess.run([reference_binary] + args, input=stdin, capture_output=True)
        ours = subprocess.run(
            [sys.executable, "-c", code] + args,
            input=stdin, capture_output=True, env=env, timeout=600,
        )
        assert ours.stdout == ref.stdout, (args, ours.stdout, ref.stdout)
        assert ours.stderr == ref.stderr, (args, ours.stderr[:500], ref.stderr)
        assert ours.returncode == ref.returncode


def test_mixed_flag_campaign(reference_binary):
    """The randomized mixed-flag campaign, in the gate (VERDICT r1
    item 5): seed-pinned cases over every flag combination class,
    ACGT + full printable-byte alphabets, params in [-3, 4], lengths up
    to 20 — byte-compared on stdout, stderr, and exit code."""
    import os
    import random

    rng = random.Random(20260816)
    full_alpha = [chr(c) for c in range(33, 127)]
    for trial in range(160):
        lens = rng.choice([(4, 3), (8, 6), (8, 8), (12, 5), (20, 14), (1, 20)])
        alpha = "ACGT" if trial % 3 else full_alpha
        s1 = "".join(rng.choice(alpha) for _ in range(lens[0]))
        s2 = "".join(rng.choice(alpha) for _ in range(lens[1]))
        params = [str(rng.randint(-3, 4)) for _ in range(3)]
        flags = [
            f for f in ("-c", "-l", "-q", "-s", "-t", "-u") if rng.random() < 0.35
        ]
        if rng.random() < 0.15:
            flags += ["-p", str(rng.randint(2, 8))]
        args = flags + ["--"] + params
        stdin = f"{s1} {s2}".encode()
        # the reference enumerates ALL optimal alignments whenever it
        # prints them (-q without -l/-s/-t is the only skip,
        # needleman-wunsch.c:667); degenerate params make that set
        # astronomically large and the reference runs ~forever
        # [verified: '-l -q -- -1 2 -3' did not finish in 120 s].
        # Pre-count with our O(M*N) engine and skip explosive cases.
        enumerates = ("-q" not in flags) or any(
            f in flags for f in ("-l", "-s", "-t")
        )
        if enumerates:
            from nw_tpu.models.needleman_wunsch import align as _align

            count = _align(
                s1.encode(), s2.encode(),
                int(params[0]), int(params[1]), int(params[2]),
            ).solution_count
            if count > 2000:
                continue
        rc_ref, out_ref, err_ref = run_ref(reference_binary, args, stdin)
        rc, out, err = run_ours(args, stdin)
        err_ref = err_ref.replace(
            reference_binary.encode(), b"needleman-wunsch"
        ).replace(
            os.path.basename(reference_binary).encode(), b"needleman-wunsch"
        )
        assert out == out_ref, (args, stdin, out[:200], out_ref[:200])
        assert err == err_ref, (args, stdin, err[:200], err_ref[:200])
        assert rc == rc_ref, (args, stdin)


def test_debug_build_parity(reference_debug_binary, monkeypatch):
    """NW_TPU_DEBUG=1 reproduces the reference DEBUG build's stderr
    traces (dbg.h:53-57) byte-for-byte, including the walk-table
    branch-count print (needleman-wunsch.c:624-625) and the threaded
    spawn/join lines (VERDICT r1 item 8).  Program-name prefixes are
    normalized (each build embeds its own argv[0])."""
    import re

    monkeypatch.setenv("NW_TPU_DEBUG", "1")
    norm = lambda b: re.sub(rb"(?m)^[^ ]*: debug:", b"X: debug:", b)
    cases = [
        (["-s", "1", "1", "1"], b"GCATGCU GATTACA"),
        (["-l", "2", "1", "1"], b"GT GA"),
        (["-q", "-s", "1", "1", "1"], b"GAT GTA"),
        (["-p", "4", "-s", "1", "1", "1"], b"GCATGCU GATTACA"),
        (["-q", "1", "1", "1"], b"A B"),
        (["-q", "-s", "-t", "0", "0", "0"], b"GT GA"),
    ]
    for args, stdin in cases:
        rc_ref, out_ref, err_ref = run_ref(reference_debug_binary, args, stdin)
        rc, out, err = run_ours(args, stdin)
        assert out == out_ref, (args, out, out_ref)
        assert norm(err) == norm(err_ref), (args, err, err_ref)
        assert rc == rc_ref
