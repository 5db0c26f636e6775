"""REAL multi-process validation of the distributed path.

Spawns two separate Python processes coordinated by jax.distributed
(CPU backend, 4 virtual devices each -> one 8-device global mesh),
runs align_batch_sharded with each process feeding only its local
shard, and checks the psum-merged stats and per-process score shards
against a single-process run of the same batch.  This is the actual
multi-host protocol (coordinator + make_array_from_process_local_data),
not the single-process virtual-mesh approximation.
"""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    # initialize the multi-process runtime BEFORE anything touches the
    # backend (importing nw_tpu is safe, but keep the canonical order)
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from nw_tpu.parallel.distributed import (
        global_batch_from_local,
        init_distributed,
    )
    assert init_distributed(coord, nproc, pid)
    import jax.numpy as jnp
    import numpy as np
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8  # 4 local x 2 processes

    from jax.sharding import Mesh

    from nw_tpu.ops.encode import encode_batch
    from nw_tpu.parallel.data_parallel import align_batch_sharded

    # every process derives the same global pair list deterministically,
    # then feeds ONLY its local half
    rng = np.random.default_rng(123)
    pairs = [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 40)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 40)))),
        )
        for _ in range(64)
    ]
    tops, sides, l1, l2 = encode_batch(
        [(a.encode(), b.encode()) for a, b in pairs], 40, 40
    )
    half = 32
    lo, hi = pid * half, (pid + 1) * half

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    g_tops, g_sides, g_l1, g_l2 = global_batch_from_local(
        mesh, "data", tops[lo:hi], sides[lo:hi], l1[lo:hi], l2[lo:hi]
    )
    scores, stats = align_batch_sharded(
        g_tops, g_sides, g_l1, g_l2,
        m=2, k=1, d=1, mesh=mesh, with_counts=True,
    )
    # each process can materialize its addressable score shards
    local = np.concatenate(
        [np.asarray(s.data) for s in scores.addressable_shards]
    )
    print("RESULT " + json.dumps({
        "pid": pid,
        "stats": {k: int(v) for k, v in stats.items()},
        "local_scores": local.tolist(),
    }))
    """
)


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    import os

    import nw_tpu

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(nw_tpu.__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT ")]
        assert line, out.decode()[-500:]
        outs.append(json.loads(line[0][len("RESULT "):]))

    # both processes agree on the merged stats
    assert outs[0]["stats"] == outs[1]["stats"]

    # reconstruct the global scores and compare to a single-process run
    import jax.numpy as jnp

    from nw_tpu.ops.encode import encode_batch
    from nw_tpu.ops.fill_scan import fill_scores_batch

    rng = np.random.default_rng(123)
    pairs = [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 40)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 40)))),
        )
        for _ in range(64)
    ]
    tops, sides, l1, l2 = encode_batch(
        [(a.encode(), b.encode()) for a, b in pairs], 40, 40
    )
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.array(outs[0]["local_scores"] + outs[1]["local_scores"])
    np.testing.assert_array_equal(np.sort(got), np.sort(ref))
    assert outs[0]["stats"]["pairs"] == 64
    assert outs[0]["stats"]["score_sum"] == int(ref.astype(np.int64).sum())
    assert outs[0]["stats"]["score_min"] == int(ref.min())
    assert outs[0]["stats"]["score_max"] == int(ref.max())


HUGE_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from nw_tpu.parallel.distributed import init_distributed
    assert init_distributed(coord, nproc, pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nw_tpu.ops.encode import encode
    from nw_tpu.parallel.huge_pair import huge_pair_align_sharded

    # one pair, identical on every process; the DP matrix shards over
    # the 8-device (2 hosts x 4) seq mesh -- BASELINE config 5
    rng = np.random.default_rng(7)
    s1 = "".join(rng.choice(list("ACGT"), 90))
    s2 = "".join(rng.choice(list("ACGT"), 110))
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))
    rep = NamedSharding(mesh, P())
    top = jax.device_put(jnp.asarray(encode(s1)), rep)
    side = jax.device_put(jnp.asarray(encode(s2)), rep)
    r = huge_pair_align_sharded(top, side, 2, 1, 1, mesh, chunk=16)
    print("RESULT " + json.dumps({
        "pid": pid, "score": int(r.score), "n": int(r.n),
        "ops": r.ops.tolist(),
    }))
    """
)


def test_two_process_huge_pair(tmp_path):
    """BASELINE config 5 on a REAL 2-process mesh: one pair's tiled
    fill + chunked halo + segment-relay walk across hosts, bit-equal
    to the single-process oracle."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    import os

    import nw_tpu

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(nw_tpu.__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    script = tmp_path / "huge_worker.py"
    script.write_text(HUGE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT ")]
        assert line, out.decode()[-500:]
        outs.append(json.loads(line[0][len("RESULT "):]))
    assert outs[0] == dict(outs[1], pid=0)

    # single-process oracle
    import jax.numpy as jnp

    from nw_tpu.ops import traceback
    from nw_tpu.ops.encode import encode
    from nw_tpu.ops.fill_scan import fill_diag

    rng = np.random.default_rng(7)
    s1 = "".join(rng.choice(list("ACGT"), 90))
    s2 = "".join(rng.choice(list("ACGT"), 110))
    ref = fill_diag(jnp.asarray(encode(s1)), jnp.asarray(encode(s2)), 2, 1, 1)
    opsr, nr = traceback.traceback_greedy(ref["arrows"], 90, 110, max_steps=200)
    assert outs[0]["score"] == int(ref["score"])
    assert outs[0]["n"] == int(nr)
    assert outs[0]["ops"] == np.asarray(opsr)[: int(nr)].tolist()
