"""S3Gen per-stage breakdown on hardware: conformer encoder, one UNet (CFM
estimator) pass, full 10-step CFM, HiFT vocoder. Prints JSON lines."""

import argparse
import json
import sys
import time

import numpy as np


def timed(fn, *args, n=3):
    """fn must return a SCALAR (reduce inside the jit): the axon tunnel
    transfers at single-digit MB/s, so reading back a full activation would
    dominate the timing."""
    import jax

    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        # force a scalar readback: axon block_until_ready can return early
        float(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from chatterbox_tpu.models.s3gen.conformer import upsample_conformer_encoder
    from chatterbox_tpu.models.s3gen.flow import flow_inference
    from chatterbox_tpu.models.s3gen.hifigan import hift_generate
    from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig, init_s3gen
    from chatterbox_tpu.models.s3gen.unet import unet_forward
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    cfg = S3GenConfig()
    params = synthetic_init(lambda k: init_s3gen(k, cfg))
    params = dict(params)
    params["flow"] = cast_floating_jit(params["flow"], jnp.bfloat16)
    print("[stages] params ready", file=sys.stderr, flush=True)

    b, tb, p_len = args.batch, args.tokens, 125
    t_mel = 2 * (p_len + tb)  # 750 at defaults
    rng = np.random.default_rng(0)
    rows = 2 * b  # CFG pair, as in the real CFM call

    results = {}

    # one UNet estimator pass (the CFM runs 10 of these on 2B rows)
    x = jnp.asarray(rng.standard_normal((rows, t_mel, 80)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((rows, t_mel, 80)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((rows, 80)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((rows, t_mel, 80)).astype(np.float32))
    tt = jnp.full((rows,), 0.5)

    unet_fn = jax.jit(lambda pr, *a: jnp.sum(unet_forward(pr, cfg.flow.estimator, *a).astype(jnp.float32)))
    results["unet_pass_ms"] = 1000 * timed(unet_fn, params["flow"]["estimator"], x, mu, spk, cond, tt)

    # conformer encoder (runs once per batch over [prompt; gen] tokens)
    tokens = jnp.asarray(rng.integers(0, 6561, (b, p_len + tb)).astype(np.int32))
    tok_lens = jnp.full((b,), p_len + tb, jnp.int32)

    def enc(pr, tokens, lens):
        emb = pr["input_embedding"]["w"][tokens]
        tmask = jnp.arange(tokens.shape[1])[None] < lens[:, None]
        out = upsample_conformer_encoder(pr["encoder"], emb, cfg.flow.encoder, key_mask=tmask)
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), jax.tree.leaves(out)[0])

    enc_fn = jax.jit(enc)
    results["conformer_ms"] = 1000 * timed(enc_fn, params["flow"], tokens, tok_lens)

    # full flow (conformer + 10-step CFM)
    noise = jnp.asarray(rng.standard_normal((b, t_mel, 80)).astype(np.float32))
    prompt_tok = jnp.asarray(rng.integers(0, 6561, (b, p_len)).astype(np.int32))
    prompt_feat = jnp.asarray(rng.standard_normal((b, 2 * p_len, 80)).astype(np.float32))
    emb192 = jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32))
    gen_tok = jnp.asarray(rng.integers(0, 6561, (b, tb)).astype(np.int32))

    flow_fn = jax.jit(
        lambda pr, *a: jnp.sum(jax.tree.leaves(flow_inference(pr, cfg.flow, *a))[0].astype(jnp.float32))
    )
    results["flow_total_ms"] = 1000 * timed(
        flow_fn, params["flow"], gen_tok, jnp.full((b,), tb, jnp.int32),
        prompt_tok, jnp.full((b,), p_len, jnp.int32), prompt_feat, emb192, noise,
    )

    # HiFT vocoder
    mel = jnp.asarray(rng.standard_normal((b, 2 * tb, 80)).astype(np.float32))
    hift_fn = jax.jit(lambda pr, m, k: jnp.sum(jax.tree.leaves(hift_generate(pr, cfg.hift, m, rng=k))[0].astype(jnp.float32)))
    results["hift_ms"] = 1000 * timed(hift_fn, params["hift"], mel, jax.random.PRNGKey(0))

    results = {k: round(v, 1) for k, v in results.items()}
    results.update(batch=b, tokens=tb, t_mel=t_mel, cfm_rows=rows)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
