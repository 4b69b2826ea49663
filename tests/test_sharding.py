"""Multi-device tests on the virtual 8-CPU mesh: sharded generation matches
single-device results; tp-sharded train step runs (SURVEY.md §2.3 plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.parallel.sharding import make_mesh, shard_params, t3_param_specs
from chatterbox_tpu.pipeline.tts import ChatterboxTTS

from test_pipeline import TINY_S3GEN, TINY_T3


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_data_parallel_generate_matches_single(devices8):
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    texts = [f"Sentence number {i}." for i in range(8)]

    tts1 = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    conds = tts1.prepare_conditionals(ref)
    wavs1 = tts1.generate_batch(texts, conds=conds, max_new_tokens=8, seed=2)

    tts2 = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    tts2.with_mesh(make_mesh((8, 1), devices8))
    conds2 = tts2.prepare_conditionals(ref)
    wavs2 = tts2.generate_batch(texts, conds=conds2, max_new_tokens=8, seed=2)

    assert len(wavs1) == len(wavs2) == 8
    for a, b in zip(wavs1, wavs2):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_tensor_parallel_t3_matches_replicated(devices8):
    """tp=2 sharded T3 generation must reproduce single-device tokens."""
    from chatterbox_tpu.core.sampling import SamplingConfig
    from chatterbox_tpu.models.t3.t3 import init_t3, t3_generate

    cfg = TINY_T3
    params = init_t3(jax.random.PRNGKey(0), cfg)
    text = np.concatenate([[[255]], np.full((1, 6), 9), [[0]]], 1).astype(np.int32)
    args = (
        jnp.asarray(np.tile(text, (4, 1))),
        jnp.full((4,), 8, jnp.int32),
        jnp.zeros((4, 256)),
        jnp.zeros((4, 150), jnp.int32),
        jnp.full((4,), 0.5),
    )

    r1 = t3_generate(params, cfg, *args, jax.random.PRNGKey(1), SamplingConfig(), 10)

    mesh = make_mesh((4, 2), devices8)
    sharded = shard_params(params, mesh, t3_param_specs(params))
    r2 = jax.jit(
        lambda p, t, l, s, pt, e, k: t3_generate(p, cfg, t, l, s, pt, e, k, SamplingConfig(), 10)
    )(sharded, *args, jax.random.PRNGKey(1))

    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_data_parallel_vc_matches_single(devices8):
    """BASELINE config 5 shape: batched VC data-parallel over the mesh."""
    from chatterbox_tpu.pipeline.vc import ChatterboxVC

    rng = np.random.default_rng(3)
    target = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    sources = [(rng.standard_normal(16000) * 0.1).astype(np.float32) for _ in range(8)]

    vc1 = ChatterboxVC.from_random(seed=0, s3gen_cfg=TINY_S3GEN)
    vc1.set_target_voice(target)
    out1 = vc1.generate_batch(sources, seed=4)

    vc2 = ChatterboxVC.from_random(seed=0, s3gen_cfg=TINY_S3GEN)
    vc2.with_mesh(make_mesh((8, 1), devices8))
    vc2.set_target_voice(target)
    out2 = vc2.generate_batch(sources, seed=4)

    for a, b in zip(out1, out2):
        np.testing.assert_allclose(a, b, atol=2e-3)
