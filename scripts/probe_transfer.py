"""Probe the axon tunnel's device->host transfer rate and whether readback
overlaps with device compute (does a D2H of batch N-1's wav hide under
batch N's synthesis?). Drives the bench's overlap model in bench.py /
generate_batches_pipelined."""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    out = {}
    dev = jax.devices()[0]
    out["platform"] = dev.platform

    # --- D2H rate at the bench's wav size: (8, 250*960) int16 = 3.84 MB ---
    wav = jnp.zeros((8, 240000), jnp.int16)
    wav.block_until_ready()
    for mb, arr in [
        (3.84, wav),
        (0.96, wav[:2]),
        (15.36, jnp.zeros((32, 240000), jnp.int16)),
    ]:
        arr.block_until_ready()
        t0 = time.time()
        np.asarray(arr)
        dt = time.time() - t0
        out[f"d2h_{mb}MB_s"] = round(dt, 3)
        out[f"d2h_{mb}MB_rate_MBps"] = round(mb / dt, 1)

    # --- compute kernel ~0.5 s of device time ---
    a = jnp.zeros((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(a, iters):
        def body(i, x):
            return jnp.tanh(x @ a)

        return jax.lax.fori_loop(0, iters, body, a)[0, 0]

    # calibrate
    burn(a, 1).block_until_ready()
    t0 = time.time()
    float(burn(a, 200))
    per = (time.time() - t0) / 200
    iters = max(1, int(0.5 / per))
    t0 = time.time()
    float(burn(a, iters))
    compute_s = time.time() - t0
    out["compute_s"] = round(compute_s, 3)

    # --- overlap: dispatch compute, then read back wav while it runs ---
    r = burn(a, iters)  # async dispatch
    t0 = time.time()
    np.asarray(wav)  # D2H during compute?
    d2h_during = time.time() - t0
    float(r)
    total = time.time() - t0
    out["d2h_during_compute_s"] = round(d2h_during, 3)
    out["total_overlapped_s"] = round(total, 3)
    # if d2h_during ~= d2h alone and total ~= compute_s -> full overlap
    # if total ~= compute_s + d2h -> serialized

    print(json.dumps(out))


if __name__ == "__main__":
    main()
