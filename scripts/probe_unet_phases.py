"""Partition the CFM UNet pass wall-clock into attention / FF / resnet /
other by timing ablated variants on hardware (each ablation keeps shapes
and fusion structure, it just skips the op class). Differences between
variants attribute the time.

Usage: python scripts/probe_unet_phases.py [--rows 16] [--t 768] [--iters 6]
"""

import argparse
import sys
import time
from unittest import mock

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--t", type=int, default=768)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=10)
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

    from chatterbox_tpu.models.s3gen import unet as unet_mod
    from chatterbox_tpu.models.s3gen.unet import UNetConfig, init_unet, unet_forward
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    cfg = UNetConfig()
    params = cast_floating_jit(
        synthetic_init(lambda k: init_unet(k, cfg)), jnp.bfloat16
    )
    b, t = args.rows, args.t
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.bfloat16)
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.bfloat16)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.bfloat16)
    cond = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.bfloat16)
    tt = jnp.full((b,), 0.4, jnp.float32)
    mask = jnp.ones((b, t), bool)

    real_attn = unet_mod._attn
    real_tf = unet_mod._transformer_block
    real_resnet = unet_mod._causal_resnet

    def no_attn(p, x, n_heads, key_bias=None, use_flash=None):
        from chatterbox_tpu.core.layers import linear

        # keep the projections (matmul cost), skip the attention kernel
        if "to_qkv" in p:
            qkv = linear(p["to_qkv"], x)
            q, _, v = jnp.split(qkv, 3, axis=-1)
        else:
            v = linear(p["to_v"], x)
        return linear(p["to_out"], v)

    def no_proj_attn(p, x, n_heads, key_bias=None, use_flash=None):
        return x  # skip attention entirely incl. projections

    def no_ff_tf(p, x, cfg2, key_bias=None):
        from chatterbox_tpu.core.layers import layer_norm

        x = x + real_attn(p["attn"], layer_norm(p["norm1"], x, 1e-5), cfg2.num_heads, key_bias)
        return x

    def no_resnet(p, x, mask_c, t_emb):
        from chatterbox_tpu.core.layers import conv1d

        # channel matching via the 1x1 residual conv only
        return conv1d(p["res_conv"], x * mask_c)

    variants = {
        "full": {},
        "no_attn_kernel": {"_attn": no_attn},
        "no_attn_at_all": {"_attn": no_proj_attn},
        "no_ff": {"_transformer_block": no_ff_tf},
        "no_resnet": {"_causal_resnet": no_resnet},
    }

    def log(m):
        print(f"[unet-phases] {m}", file=sys.stderr, flush=True)

    results = {}
    for name, patches in variants.items():
        ctxs = [mock.patch.object(unet_mod, k, v) for k, v in patches.items()]
        for c in ctxs:
            c.start()
        try:
            # K passes inside ONE jit: this tunnel's per-dispatch overhead
            # measured 28-35 ms in r3 (was 1-3 ms in r2) and would swamp a
            # single ~20 ms pass
            K = args.reps

            def rep(p, x, mu, spks, cond, tt):
                def body(xx, _):
                    y = unet_forward(p, cfg, xx, mu, spks, cond, tt, mask)
                    pad = cfg.in_channels // 4 - cfg.out_channels
                    if pad:
                        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
                    return (x + y * 1e-3).astype(x.dtype), None

                xx, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(xx.astype(jnp.float32))

            fn = jax.jit(rep)
            t0 = time.time()
            _ = float(fn(params, x, mu, spks, cond, tt))
            compile_s = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                _ = float(fn(params, x, mu, spks, cond, tt))
                times.append((time.time() - t0) / K)
            results[name] = min(times)
            log(f"{name}: {1000 * min(times):.2f} ms (compile {compile_s:.0f}s)")
        finally:
            for c in ctxs:
                c.stop()

    full = results["full"]
    print("\nattribution (ms per UNet pass):")
    print(f"  full pass              {1000 * full:.2f}")
    if "no_attn_kernel" in results:
        print(f"  attention kernel       {1000 * (full - results['no_attn_kernel']):.2f}")
    if "no_attn_at_all" in results:
        print(f"  attention + qkv/out    {1000 * (full - results['no_attn_at_all']):.2f}")
    if "no_ff" in results:
        print(f"  feed-forward           {1000 * (full - results['no_ff']):.2f}")
    if "no_resnet" in results:
        print(f"  resnets                {1000 * (full - results['no_resnet']):.2f}")


if __name__ == "__main__":
    main()
