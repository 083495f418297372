from hydrainfer_tpu.memory import BlockAllocator


def test_allocate_and_free():
    a = BlockAllocator(8)
    got = a.allocate(3)
    assert len(got) == 3
    assert len(set(got)) == 3
    assert a.n_free == 5
    a.free(got)
    assert a.n_free == 8


def test_exhaustion_returns_fewer():
    a = BlockAllocator(4)
    got = a.allocate(10)
    assert len(got) == 4
    assert a.allocate(1) == []
    a.free(got[:2])
    assert len(a.allocate(5)) == 2


def test_metrics():
    a = BlockAllocator(10)
    a.allocate(5)
    m = a.metrics()
    assert m.n_total_blocks == 10
    assert m.n_free_blocks == 5
    assert abs(m.usage - 0.5) < 1e-9
