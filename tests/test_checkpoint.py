"""Checkpoint layer tests: safetensors round-trips, pytree IO, native
pipeline save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.checkpoint.safetensors_io import load_safetensors, save_safetensors
from chatterbox_tpu.checkpoint.pytree_io import load_params, save_params


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((3, 4)).astype(np.float32),
        "b/c": rng.integers(0, 100, (7,)).astype(np.int64),
        "d": np.asarray(1.5, np.float32).reshape(()),
    }
    p = tmp_path / "x.safetensors"
    save_safetensors(tensors, p, metadata={"k": "v"})
    back = load_safetensors(p)
    for k, v in tensors.items():
        np.testing.assert_array_equal(back[k], v)


def test_safetensors_reads_torch_written(tmp_path):
    """Our reader must parse files written by the Rust safetensors crate."""
    import torch
    from safetensors.torch import save_file

    t = {
        "w": torch.randn(5, 3),
        "bf": torch.randn(4, 2).to(torch.bfloat16),
        "i": torch.arange(6, dtype=torch.int32),
    }
    p = tmp_path / "torch.safetensors"
    save_file(t, str(p))
    back = load_safetensors(p)
    np.testing.assert_allclose(back["w"], t["w"].numpy(), atol=1e-7)
    np.testing.assert_allclose(back["bf"], t["bf"].float().numpy(), atol=1e-7)
    np.testing.assert_array_equal(back["i"], t["i"].numpy())


def test_pytree_io_roundtrip(tmp_path):
    tree = {
        "layers": [
            {"w": np.ones((2, 3), np.float32), "b": np.zeros((3,), np.float32)},
            {"w": np.full((2, 3), 2.0, np.float32)},
        ],
        "emb": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "maybe": None,
    }
    p = tmp_path / "params.safetensors"
    save_params(tree, p)
    back = load_params(p, device_put=False)
    assert back["maybe"] is None
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["layers"][0]["w"], tree["layers"][0]["w"])
    np.testing.assert_array_equal(back["emb"]["w"], tree["emb"]["w"])


def test_pipeline_native_save_load(tmp_path):
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from test_pipeline import TINY_S3GEN, TINY_T3

    tts = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)
    rng = np.random.default_rng(1)
    tts.prepare_conditionals((rng.standard_normal(24000) * 0.1).astype(np.float32))
    tts.save_native(tmp_path)
    tts2 = ChatterboxTTS.from_native(tmp_path)
    tts2.t3_cfg, tts2.s3gen_cfg = TINY_T3, TINY_S3GEN
    np.testing.assert_allclose(
        np.asarray(tts2.t3_params["speech_head"]["w"]),
        np.asarray(tts.t3_params["speech_head"]["w"]),
    )
    assert tts2.conds is not None
    w = tts2.generate("Hello.", max_new_tokens=6, seed=0)
    assert w.shape[0] == 1 and np.isfinite(w).all()


def test_native_roundtrip_preserves_configs(tmp_path):
    """save_native/from_native must reproduce non-default configs (e.g. the
    tokenizer architecture inferred from checkpoint shapes at conversion)."""
    import dataclasses

    from chatterbox_tpu.models.s3tokenizer import S3TokenizerConfig
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS
    from test_pipeline import TINY_S3GEN, TINY_T3

    odd_tok = S3TokenizerConfig(n_state=96, n_head=4, n_layer=3, fsmn_kernel=5)
    s3 = dataclasses.replace(TINY_S3GEN, tokenizer=odd_tok)
    tts = ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=s3)
    tts.save_native(tmp_path)
    tts2 = ChatterboxTTS.from_native(tmp_path)
    assert tts2.s3gen_cfg.tokenizer == odd_tok
    assert tts2.t3_cfg == TINY_T3
    assert tts2.s3gen_cfg == s3


def _tiny_t3_cfg():
    from chatterbox_tpu.models.t3.llama import LlamaConfig
    from chatterbox_tpu.models.t3.t3 import T3Config

    return T3Config(
        llama=LlamaConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=16,
        )
    )


def _tiny_batch(rng, b=2):
    return {
        "speaker_emb": jnp.asarray(rng.standard_normal((b, 256)), jnp.float32),
        "prompt_tokens": jnp.asarray(rng.integers(0, 100, (b, 150)), jnp.int32),
        "emotion_adv": jnp.full((b,), 0.5, jnp.float32),
        "text_tokens": jnp.asarray(rng.integers(0, 100, (b, 16)), jnp.int32),
        "text_lens": jnp.full((b,), 16, jnp.int32),
        "speech_tokens": jnp.asarray(rng.integers(0, 100, (b, 24)), jnp.int32),
        "speech_lens": jnp.full((b,), 24, jnp.int32),
    }


def test_trainer_checkpoint_resume_exact(tmp_path):
    """Killing a run after step 2 and resuming from its checkpoint produces
    bit-identical params and losses to the uninterrupted 4-step run."""
    from chatterbox_tpu.models.t3.t3 import init_t3
    from chatterbox_tpu.train.trainer import T3Trainer

    cfg = _tiny_t3_cfg()
    rng = np.random.default_rng(0)
    batches = [_tiny_batch(rng) for _ in range(4)]

    tr = T3Trainer(cfg, init_t3(jax.random.PRNGKey(0), cfg), learning_rate=1e-3)
    losses = [tr.step(b)["loss"] for b in batches[:2]]
    ckpt = tmp_path / "train_state.safetensors"
    tr.save(ckpt)
    losses += [tr.step(b)["loss"] for b in batches[2:]]
    assert all(np.isfinite(l) for l in losses)

    tr2 = T3Trainer.resume(ckpt, cfg, init_t3(jax.random.PRNGKey(7), cfg), learning_rate=1e-3)
    assert tr2.step_num == 2
    resumed = [tr2.step(b)["loss"] for b in batches[2:]]
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(losses[2:]))
    for a, b in zip(jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_load_rejects_mismatched_config(tmp_path):
    from chatterbox_tpu.models.t3.llama import LlamaConfig
    from chatterbox_tpu.models.t3.t3 import T3Config, init_t3
    from chatterbox_tpu.train.trainer import T3Trainer

    cfg = _tiny_t3_cfg()
    tr = T3Trainer(cfg, init_t3(jax.random.PRNGKey(0), cfg))
    ckpt = tmp_path / "s.safetensors"
    tr.save(ckpt)

    other = T3Config(
        llama=LlamaConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,  # different depth
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=16,
        )
    )
    tr2 = T3Trainer(other, init_t3(jax.random.PRNGKey(0), other))
    with pytest.raises(ValueError):
        tr2.load(ckpt)


def test_trainer_load_rejects_same_size_different_shape(tmp_path):
    """A config change preserving leaf count AND per-leaf element count must
    not silently reshape into the wrong layout (r2 advisor finding)."""
    from chatterbox_tpu.models.t3.t3 import init_t3
    from chatterbox_tpu.train.trainer import T3Trainer

    cfg = _tiny_t3_cfg()
    tr = T3Trainer(cfg, init_t3(jax.random.PRNGKey(0), cfg))
    ckpt = tmp_path / "s.safetensors"
    tr.save(ckpt)

    tr2 = T3Trainer(cfg, init_t3(jax.random.PRNGKey(1), cfg))
    # transpose one 2-D leaf's template shape in place: same size, new shape
    leaves, treedef = jax.tree_util.tree_flatten(tr2.params)
    for i, leaf in enumerate(leaves):
        if leaf.ndim == 2 and leaf.shape[0] != leaf.shape[1]:
            leaves[i] = leaf.T
            break
    tr2.params = jax.tree_util.tree_unflatten(treedef, leaves)
    with pytest.raises(ValueError):
        tr2.load(ckpt)
