"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4.3.4):
data-parallel batch sharding with psum stat merge, and sequence-parallel
single-pair wavefront with ppermute halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nw_tpu.ops.encode import encode, encode_batch
from nw_tpu.ops.fill_scan import fill_diag, fill_scores_batch
from nw_tpu.parallel.data_parallel import align_batch_sharded, shard_batch
from nw_tpu.parallel.mesh import make_mesh
from nw_tpu.parallel.wavefront import fill_score_seq_sharded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh((8,), ("data",))


@pytest.fixture(scope="module")
def mesh2x4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh((2, 4), ("data", "seq"))


def _pairs(rng, n, lo=4, hi=16):
    return [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
        )
        for _ in range(n)
    ]


def test_data_parallel_matches_single_device(mesh8):
    rng = np.random.default_rng(0)
    pairs = _pairs(rng, 32)
    tops, sides, l1, l2 = encode_batch(pairs, 16, 16)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 1, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    t, s, a, b = shard_batch(mesh8, "data", tops, sides, l1, l2)
    scores, stats = align_batch_sharded(
        t, s, a, b, m=1, k=1, d=1, mesh=mesh8, with_counts=True
    )
    np.testing.assert_array_equal(np.asarray(scores), ref)
    assert int(stats["pairs"]) == 32
    assert int(stats["score_sum"]) == int(ref.astype(np.int64).sum())
    assert int(stats["score_min"]) == int(ref.min())
    assert int(stats["score_max"]) == int(ref.max())
    # solutions == sum of per-pair DP counts (mod 2^32)
    from nw_tpu.ops.fill_scan import fill_diag_batch
    from nw_tpu.ops.pathcount import count_paths

    out = fill_diag_batch(tops, sides, 1, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    counts = jax.vmap(count_paths)(out["arrows"], jnp.asarray(l1), jnp.asarray(l2))
    expected = np.uint32(np.asarray(counts).astype(np.uint64).sum() % (2**32))
    assert np.uint32(int(stats["solutions"])) == expected


def test_seq_parallel_matches_single_device(mesh2x4):
    rng = np.random.default_rng(1)
    for _ in range(3):
        a = "".join(rng.choice(list("ACGT"), 37))
        b = "".join(rng.choice(list("ACGT"), 53))
        ref = int(fill_diag(encode(a), encode(b), 2, 1, 1, with_arrows=False)["score"])
        got = int(
            fill_score_seq_sharded(
                encode(a), encode(b), m=2, k=1, d=1, mesh=mesh2x4, axis="seq"
            )
        )
        assert got == ref


def test_seq_parallel_empty_sides(mesh2x4):
    ref = int(fill_diag(encode("ACGT"), encode(""), 1, 1, 1, with_arrows=False)["score"])
    got = int(
        fill_score_seq_sharded(
            encode("ACGT"), encode(""), m=1, k=1, d=1, mesh=mesh2x4, axis="seq"
        )
    )
    assert got == ref == -4


def test_combined_mesh_dp_and_sp(mesh2x4):
    """dp over 'data' with sp fill nested is exercised by dryrun; here we
    check dp works on the 2-axis mesh too."""
    rng = np.random.default_rng(2)
    pairs = _pairs(rng, 16)
    tops, sides, l1, l2 = encode_batch(pairs, 16, 16)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    t, s, a, b = shard_batch(mesh2x4, "data", tops, sides, l1, l2)
    scores, stats = align_batch_sharded(t, s, a, b, m=2, k=1, d=1, mesh=mesh2x4)
    np.testing.assert_array_equal(np.asarray(scores), ref)
    assert int(stats["cells"]) == int(
        (l1.astype(np.int64) * l2.astype(np.int64)).sum()
    )


def test_overlap_scores_shard_over_data_mesh(mesh8):
    """The overlap (semi-global) batch fill shards over the data axis
    like any pair batch: shard_map over the mesh == single device."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from nw_tpu.models.overlap import overlap_scores_scan_batch

    rng = np.random.default_rng(5)
    pairs = _pairs(rng, 32, 0, 16)
    tops, sides, l1, l2 = encode_batch(pairs, 16, 16)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = np.asarray(overlap_scores_scan_batch(tops, sides, 2, 1, 1, l1j, l2j))

    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        lambda t, s, a, b: overlap_scores_scan_batch(t, s, 2, 1, 1, a, b),
        mesh=mesh8,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    sh = NamedSharding(mesh8, P("data"))
    args = [jax.device_put(x, sh) for x in (tops, sides, l1j, l2j)]
    got = np.asarray(jax.jit(fn)(*args))
    np.testing.assert_array_equal(got, ref)
