"""Adaptive token-read batching policy (NodeConfig.adaptive_postprocess)."""
from hydrainfer_tpu.cluster.node import adaptive_postprocess_k


def test_saturated_uses_full_k():
    assert adaptive_postprocess_k(32, 0, 32, 4) == 4        # batch cap
    assert adaptive_postprocess_k(24, 0, 32, 4) == 4        # >= 0.75 * cap
    assert adaptive_postprocess_k(3, 5, 32, 4) == 4         # queue backlog


def test_idle_streams_per_token():
    assert adaptive_postprocess_k(1, 0, 32, 4) == 1
    assert adaptive_postprocess_k(2, 0, 32, 4) == 1
    assert adaptive_postprocess_k(0, 0, 32, 4) == 1


def test_mid_load_halves():
    assert adaptive_postprocess_k(8, 0, 32, 4) == 2
    assert adaptive_postprocess_k(8, 0, 32, 8) == 4


def test_tiny_cap_never_zero():
    assert adaptive_postprocess_k(5, 0, 32, 1) == 1
    # max_running=1: any running request counts as saturated
    assert adaptive_postprocess_k(1, 0, 1, 4) == 4
