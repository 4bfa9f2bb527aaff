"""Headline benchmark: aggregate IQ throughput of the full PHY loopback.

Measures TX synthesis -> AWGN channel -> RX demod/decode (the reference's
loopback_simulator hot path, lib/src/upper/loopback/tfw_loopback.cpp) as a
batched jit step and reports the aggregate IQ sample rate as a multiple of
real time.  The reference is a real-time SDR: by construction it processes
exactly 1x real time per channel on a tuned x86 host (README.md:9,224-230),
so vs_baseline == real-time multiple.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes
    from dectnrp_tpu.simulation.channels import awgn

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    # Flagship config: u=1, b=16 (1024-pt FFT, 27.648 Ms/s DECT rate), 4-slot
    # packet, MCS 4 (16-QAM R=3/4), SISO, Z=6144.
    psdef = PacketSizesDef(1, 16, 1, 4, 0, 4, 6144)
    ps = get_packet_sizes(psdef)
    samp_rate = 1_728_000 * psdef.b * psdef.u
    nid = 0x12345678

    tx = build_tx(psdef, nid, 1)
    rx = build_rx(psdef, nid, 1)

    B = 64 if on_tpu else 4
    iters = 10 if on_tpu else 2

    rng = np.random.default_rng(0)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    nv = jnp.float32(10.0 ** (-15.0 / 10.0))

    @jax.jit
    def step(plcf_bits, tb_bits, key):
        flags = jnp.zeros((plcf_bits.shape[0],), bool)
        iq = tx(plcf_bits, tb_bits, flags, flags)
        y = awgn(key, iq, nv)
        out = rx(y, nv)
        return out["tb_ok"]

    from dectnrp_tpu.common.benchtime import fetch

    key = jax.random.PRNGKey(0)
    ok = step(plcf, tb, key)
    if not bool(np.asarray(ok).all()):
        print(json.dumps({"metric": "loopback_realtime_multiple", "value": 0.0,
                          "unit": "x_realtime", "vs_baseline": 0.0,
                          "error": "decode failed at 15 dB SNR"}))
        sys.exit(1)

    # fetch-synced timing: block_until_ready does not wait on the tunneled
    # TPU backend; a host fetch of (a reduction of) the last output drains
    # the in-order dispatch queue (common/benchtime.py)
    fetch(step(plcf, tb, key))
    t0 = time.perf_counter()
    for i in range(iters):
        ok = step(plcf, tb, jax.random.PRNGKey(i + 1))
    fetch(ok)
    dt = time.perf_counter() - t0

    samples = B * iters * ps.N_samples_packet
    sps = samples / dt
    rt = sps / samp_rate
    print(json.dumps({
        "metric": "loopback_realtime_multiple",
        "value": round(rt, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt, 3),
        "detail": {
            "config": "u=1 b=16 4-slot MCS4 SISO loopback (TX+AWGN+RX decode)",
            "samples_per_s": round(sps),
            "dect_rate_hz": samp_rate,
            "batch": B, "iters": iters,
            "platform": dev.platform,
        },
    }))


if __name__ == "__main__":
    main()
