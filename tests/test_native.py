

def test_native_ops_to_strings_batch_parity():
    """Native one-pass strings builder == the numpy fallback, ragged."""
    import numpy as np

    from nw_tpu.ops.traceback import ops_to_strings_batch
    from nw_tpu.runtime import native

    if native.load() is None:
        import pytest

        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(5)
    pairs, opss, nss = [], [], []
    S = 64
    for _ in range(200):
        n = int(rng.integers(0, S))
        ops = rng.integers(0, 3, n)
        l1 = int((ops != 2).sum())
        l2 = int((ops != 1).sum())
        a = rng.integers(65, 69, l1).astype(np.uint8).tobytes()
        b = rng.integers(65, 69, l2).astype(np.uint8).tobytes()
        pairs.append((a, b))
        row = np.full(S, 3, np.int8)
        row[:n] = ops
        opss.append(row)
        nss.append(n)
    ops = np.stack(opss)
    ns = np.array(nss, np.int32)

    got = native.load().ops_to_strings_batch(ops, ns, pairs)

    import nw_tpu.ops.traceback as tb

    # force the numpy path for the oracle
    orig_cached, orig_failed = native._cached, native._failed
    try:
        native._cached, native._failed = None, True
        want = ops_to_strings_batch(ops, ns, pairs)
    finally:
        native._cached, native._failed = orig_cached, orig_failed
    assert got == want
