"""Pallas kernel tests (interpret mode on CPU) vs the dense XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.flash_decode import flash_decode_layer_attention


def _xla_ref(q, k_all, v_all, mask_all):
    """Dense attention over the already-appended sequence [cache; self]."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhd,bhsd->bhs", q, k_all).astype(jnp.float32) * scale
    logits = jnp.where(mask_all[:, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", probs, v_all.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("layer", [0, 2])
def test_flash_decode_layer_matches_xla(dtype, layer):
    rng = np.random.default_rng(0)
    l, b, h, s, d = 3, 4, 4, 256, 64
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    k_new = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    lens = np.array([100, 256, 1, 64])
    mask = jnp.asarray(np.arange(s)[None] < lens[:, None])

    k_all = jnp.concatenate([cache[layer, 0], k_new[:, :, None]], axis=2)
    v_all = jnp.concatenate([cache[layer, 1], v_new[:, :, None]], axis=2)
    mask_all = jnp.concatenate([mask, jnp.ones((b, 1), bool)], axis=1)
    ref = _xla_ref(q, k_all, v_all, mask_all)

    got = flash_decode_layer_attention(
        cache, jnp.int32(layer), q, k_new, v_new, mask, interpret=True
    )
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_flash_decode_inside_scan_matches_dense_decode():
    """Drive the kernel exactly as llama_decode_step does: scanned layers,
    dynamic layer index, growing valid mask."""
    rng = np.random.default_rng(1)
    l, b, h, s, d = 2, 2, 4, 128, 32
    cache = jnp.asarray(rng.standard_normal((l, 2, b, h, s, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    mask = jnp.asarray(np.arange(s)[None] < np.array([50, 90])[:, None])

    def body(_, lid):
        return None, flash_decode_layer_attention(
            cache, lid, q, kn, vn, mask, interpret=True
        )

    _, outs = jax.lax.scan(body, None, jnp.arange(l, dtype=jnp.int32))
    for lid in range(l):
        k_all = jnp.concatenate([cache[lid, 0], kn[:, :, None]], axis=2)
        v_all = jnp.concatenate([cache[lid, 1], vn[:, :, None]], axis=2)
        mask_all = jnp.concatenate([mask, jnp.ones((b, 1), bool)], axis=1)
        ref = _xla_ref(q, k_all, v_all, mask_all)
        np.testing.assert_allclose(np.asarray(outs[lid]), np.asarray(ref), atol=1e-5)
