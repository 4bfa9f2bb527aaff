"""TPU probe: BCJR window size + RNG impl cost at the u8b16 shape.

The sliding-window BCJR pays a (Lw + 2D)/Lw acquisition overhead per
window (D=32): Lw=128 -> 1.5x, Lw=256 -> 1.25x, Lw=512 -> 1.125x. Larger
windows cost VMEM ([3 rows of Lw, CT] tiles) but less redundant trellis.
Also times jax.random.normal under threefry vs rbg for the bench-harness
AWGN (13.98 ms/step at u8b16 B=128 with threefry — pure simulation cost).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.common.benchtime import synced_ms_marginal
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode

    K = 6144
    Bc = 512
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (Bc, K)), jnp.uint8)
    enc = jax.jit(lambda bb: turbo_encode(bb, K))
    d = np.asarray(enc(bits))
    llr = jnp.asarray(np.where(d > 0, 4.0, -4.0).astype(np.float32))

    for w in (128, 256, 512):
        dec = jax.jit(lambda l, w=w: turbo_decode(l, K, n_iter=2,
                                                  window=w)[0])
        ok = np.asarray(jnp.mean((np.asarray(dec(llr)) == np.asarray(bits))
                                 .astype(np.float32)))
        ms = synced_ms_marginal(dec, (llr,), iters=6)
        print(json.dumps({"window": w, "ms_2iter": round(ms, 3),
                          "bit_match": float(ok)}), flush=True)

    # RNG cost: [128, 192512] complex noise
    B, T = 128, 192512
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def gen(k):
            k1, k2 = jax.random.split(k)
            n = (jax.random.normal(k1, (B, T), jnp.float32)
                 + 1j * jax.random.normal(k2, (B, T), jnp.float32))
            return jnp.sum(jnp.abs(n))

        ms = synced_ms_marginal(gen, (key,), iters=8)
        print(json.dumps({"rng": impl, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
