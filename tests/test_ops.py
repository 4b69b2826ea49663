"""Pallas kernel tests (interpret mode on CPU) vs the dense XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.flash_decode import flash_decode_attention


def _xla_ref(q, k, v, mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_decode_matches_xla(dtype):
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
    lens = np.array([100, 256])
    mask = jnp.asarray(np.arange(s)[None] < lens[:, None])
    ref = _xla_ref(q, k, v, mask)
    got = flash_decode_attention(q, k, v, mask, interpret=True)
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol
    )
