"""Randomized differential campaign vs the reference binary.

Heavier than the pytest differential suite: N random cases over mixed
flags (-c -l -q -s -t -u -p), params in [-3, 4], ACGT and full
printable-byte alphabets, several length buckets.  Byte-compares
stdout + stderr (argv[0]-normalized) + exit code.

    NW_TPU_PLATFORM=cpu python scripts/differential_campaign.py [N] [ref] [seed]

Run with the persistent compile cache set (see CLAUDE.md) or the first
few cases pay cold compiles.  Exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    ref = sys.argv[2] if len(sys.argv) > 2 else "/root/build-ref/needleman-wunsch"
    if not os.path.exists(ref):
        print(f"reference binary not found at {ref}", file=sys.stderr)
        return 2

    from conftest import run_ours

    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 2026
    rng = random.Random(seed)
    full_alpha = [chr(c) for c in range(33, 127)]
    fails = 0
    for trial in range(n):
        lens = rng.choice([(4, 3), (8, 6), (8, 8), (12, 5)])
        alpha = "ACGT" if trial % 3 else full_alpha
        s1 = "".join(rng.choice(alpha) for _ in range(lens[0]))
        s2 = "".join(rng.choice(alpha) for _ in range(lens[1]))
        params = [str(rng.randint(-3, 4)) for _ in range(3)]
        flags = [f for f in ("-c", "-l", "-q", "-s", "-t", "-u") if rng.random() < 0.35]
        if rng.random() < 0.15:
            flags += ["-p", str(rng.randint(2, 8))]
        args = flags + ["--"] + params
        stdin = f"{s1} {s2}".encode()
        p = subprocess.run([ref] + args, input=stdin, capture_output=True)
        rc, out, err = run_ours(args, stdin)
        err_ref = p.stderr.replace(ref.encode(), b"needleman-wunsch").replace(
            os.path.basename(ref).encode(), b"needleman-wunsch"
        )
        if out != p.stdout or err != err_ref or rc != p.returncode:
            fails += 1
            print(f"MISMATCH args={args} stdin={stdin!r}")
            if fails > 5:
                break
        if (trial + 1) % 100 == 0:
            print(f"{trial + 1}/{n} cases, {fails} mismatches")
    print(f"campaign: {n} randomized mixed-flag cases, {fails} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
