import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops import (
    RotaryEmbedding,
    apply_rotary_emb,
    compute_default_inv_freq,
    gelu_and_mul,
    layer_norm,
    new_gelu,
    quick_gelu,
    rms_norm,
    silu_and_mul,
)


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    expected = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    mu, var = x.mean(-1, keepdims=True), x.var(-1, keepdims=True)
    expected = (x - mu) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_silu_and_mul():
    rng = np.random.default_rng(2)
    gu = rng.standard_normal((4, 16)).astype(np.float32)
    out = np.asarray(silu_and_mul(jnp.asarray(gu)))
    g, u = gu[:, :8], gu[:, 8:]
    expected = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_gelu_variants_finite():
    x = jnp.linspace(-5, 5, 64).reshape(4, 16)
    for fn in (quick_gelu, new_gelu):
        assert bool(jnp.all(jnp.isfinite(fn(x))))
    assert gelu_and_mul(jnp.concatenate([x, x], -1)).shape == x.shape


@pytest.mark.parametrize("interleaved", [False, True])
def test_rope_rotation_properties(interleaved):
    rng = np.random.default_rng(3)
    D = 16
    rope = RotaryEmbedding(D, 128, compute_default_inv_freq(D, 10000.0),
                           interleaved=interleaved)
    q = jnp.asarray(rng.standard_normal((6, 2, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((6, 2, D)).astype(np.float32))
    positions = jnp.asarray([0, 1, 2, 5, 9, 0])

    q_rot, k_rot = rope(q, k, positions)
    # norm-preserving
    np.testing.assert_allclose(np.linalg.norm(q_rot, axis=-1),
                               np.linalg.norm(q, axis=-1), rtol=1e-4)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(q_rot[0]), np.asarray(q[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_rot[5]), np.asarray(q[5]), atol=1e-5)
    # relative-position property: dot(q_rot[m], k_rot[n]) depends only on m-n
    rope1 = RotaryEmbedding(D, 128, compute_default_inv_freq(D, 10000.0),
                            interleaved=interleaved)
    qq = jnp.broadcast_to(q[0:1], (6, 2, D))
    kk = jnp.broadcast_to(k[0:1], (6, 2, D))
    qr, kr = rope1(qq, kk, jnp.asarray([2, 3, 4, 5, 6, 7]))
    d1 = float(jnp.vdot(qr[3, 0], kr[1, 0]))  # positions 5,3 → delta 2
    d2 = float(jnp.vdot(qr[4, 0], kr[2, 0]))  # positions 6,4 → delta 2
    assert abs(d1 - d2) < 1e-3


def test_rope_half_vs_interleaved_differ():
    rng = np.random.default_rng(4)
    D = 8
    x = jnp.asarray(rng.standard_normal((3, 1, D)).astype(np.float32))
    inv = compute_default_inv_freq(D, 10000.0)
    t = jnp.arange(3, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    a = apply_rotary_emb(x, cos, sin, interleaved=False)
    b = apply_rotary_emb(x, cos, sin, interleaved=True)
    assert not np.allclose(np.asarray(a[1:]), np.asarray(b[1:]))
