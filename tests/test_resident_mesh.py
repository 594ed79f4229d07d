"""Multi-device HBM-resident corpus (VERDICT r2 #2).

The resident image corpus must work under a data mesh in both modes —
replicated (corpus fits per chip: local gather, zero collectives) and
sharded (rows split P(axis): all_gather indices + psum_scatter exchange) —
producing BYTE-IDENTICAL batches to the host assemble path, per-batch and
as [K, B] scan chunks.
"""
import numpy as np
import pytest

from vlp_tpu.data.pipeline import ArrayBundle, DeviceLoader
from vlp_tpu.data.preprocess_host import ImageCache
from vlp_tpu.data.sampler import ShuffleBatchSampler
from vlp_tpu.ops.kernel_gate import set_kernel_mesh
from vlp_tpu.parallel.mesh import create_mesh


@pytest.fixture
def mesh8():
    mesh = create_mesh()
    yield mesh
    set_kernel_mesh(None)


def _bundle(n=24):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(n, 8, 8), dtype=np.uint8)
    cache = ImageCache.from_arrays(imgs)
    samples = [{"dataset": "INTERNAL" if i % 2 == 0 else "BTXRD",
                "image_path": f"s{i}", "tumor": i % 2,
                "clinical": np.zeros(15, np.float32)} for i in range(n)]
    return ArrayBundle(samples, cache)


def _host_batches(bundle, seed, bs, mesh):
    loader = DeviceLoader(bundle, ShuffleBatchSampler(len(bundle), bs,
                                                      seed=seed), bs, mesh)
    loader._corpus = None  # force the host assemble path
    return list(loader)


def _assert_batches_equal(hb, rb):
    assert len(hb) == len(rb)
    for x, y in zip(hb, rb):
        assert set(x) == set(y)
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]),
                                          np.asarray(y[k]), err_msg=k)


@pytest.mark.parametrize("mode,limit_mb", [
    ("replicated", "4096"),
    ("sharded", "0.0005"),  # 24*64 B corpus; 1/8th fits, whole doesn't
])
def test_mesh_resident_matches_host(mesh8, monkeypatch, mode, limit_mb):
    monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", limit_mb)
    b = _bundle(24)
    res = DeviceLoader(b, ShuffleBatchSampler(24, 8, seed=7), 8, mesh8)
    assert res._corpus is not None and res._corpus.mode == mode
    rb = list(res)
    _assert_batches_equal(_host_batches(_bundle(24), 7, 8, mesh8), rb)
    # batches arrive sharded over the mesh
    shard_dev_counts = {len(v.sharding.device_set)
                        for v in rb[0].values()}
    assert 8 in shard_dev_counts


@pytest.mark.parametrize("mode,limit_mb", [
    ("replicated", "4096"),
    ("sharded", "0.0005"),
])
def test_mesh_resident_scan_chunks_match(mesh8, monkeypatch, mode, limit_mb):
    monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", limit_mb)
    b = _bundle(24)
    res = DeviceLoader(b, ShuffleBatchSampler(24, 8, seed=9), 8, mesh8)
    assert res._corpus is not None and res._corpus.mode == mode

    host = DeviceLoader(_bundle(24), ShuffleBatchSampler(24, 8, seed=9), 8,
                        mesh8)
    host._corpus = None
    hk = list(host.iter_scan_chunks(2))
    rk = list(res.iter_scan_chunks(2))
    assert [k for k, _ in hk] == [k for k, _ in rk] == ["chunk", "single"]
    for (_, x), (_, y) in zip(hk, rk):
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]),
                                          np.asarray(y[k]), err_msg=k)


def test_sharded_mode_pads_indivisible_rows(mesh8, monkeypatch):
    """Corpus rows not divisible by the mesh: zero-padded, batches still
    byte-identical (indices never reach the pad rows)."""
    monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "0.0005")
    b = _bundle(21)  # 21 % 8 != 0
    res = DeviceLoader(b, ShuffleBatchSampler(21, 8, seed=11), 8, mesh8)
    assert res._corpus is not None and res._corpus.mode == "sharded"
    rb = list(res)
    _assert_batches_equal(_host_batches(_bundle(21), 11, 8, mesh8), rb)


def test_one_device_mesh_uses_local_mode(monkeypatch):
    """A 1-device mesh (the single-chip CLI configuration) keeps the local
    corpus mode and the unsharded device-assemble path — regression for the
    NamedSharding(mesh, None) crash."""
    import jax

    from vlp_tpu.parallel.mesh import create_mesh

    monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "4096")
    mesh1 = create_mesh(1, devices=jax.devices()[:1])
    b = _bundle(12)
    res = DeviceLoader(b, ShuffleBatchSampler(12, 4, seed=13), 4, mesh1)
    assert res._corpus is not None and res._corpus.mode == "local"
    rb = list(res)
    host = DeviceLoader(_bundle(12), ShuffleBatchSampler(12, 4, seed=13), 4,
                        mesh1)
    host._corpus = None
    _assert_batches_equal(list(host), rb)


def test_resident_2d_mesh_shards_over_data_axis(monkeypatch):
    """2-D (data=4, model=2) TP mesh: mode selection, the chunked
    all_gather reshape, and batch divisibility must all use the DATA-axis
    size (4), not mesh.size (8) — regression for the trace-time reshape
    crash and the spurious batch-divisibility rejection under TP."""
    from vlp_tpu.parallel.mesh import create_mesh

    monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "0.0005")
    mesh = create_mesh(model_parallel=2)
    try:
        b = _bundle(24)
        # batch 12 divides the 4-shard data axis but NOT the 8-device mesh
        res = DeviceLoader(b, ShuffleBatchSampler(24, 12, seed=3), 12, mesh)
        assert res._corpus is not None and res._corpus.mode == "sharded"
        host = DeviceLoader(_bundle(24), ShuffleBatchSampler(24, 12, seed=3),
                            12, mesh)
        host._corpus = None
        _assert_batches_equal(list(host), list(res))
        # the [K, B] chunked gather (scan path) traces and matches too
        host2 = DeviceLoader(_bundle(24), ShuffleBatchSampler(24, 12, seed=5),
                             12, mesh)
        host2._corpus = None
        res2 = DeviceLoader(_bundle(24), ShuffleBatchSampler(24, 12, seed=5),
                            12, mesh)
        assert res2._corpus is not None and res2._corpus.mode == "sharded"
        hk = list(host2.iter_scan_chunks(2))
        rk = list(res2.iter_scan_chunks(2))
        assert [k for k, _ in hk] == [k for k, _ in rk]
        for (_, x), (_, y) in zip(hk, rk):
            for k in x:
                np.testing.assert_array_equal(np.asarray(x[k]),
                                              np.asarray(y[k]), err_msg=k)
    finally:
        set_kernel_mesh(None)
