"""Headline benchmark: aggregate IQ throughput of the full PHY stream loopback.

Round-2 form (VERDICT.md next-round item 3): the benched pipeline is the
reference's actual hot path — a CONTINUOUS IQ stream containing packets at
random unknown offsets, searched by the sync stage, then demod/decoded:

  TX synthesis -> scatter into stream -> AWGN -> sync search (autocorrelation
  detection + coarse peak + fine crosscorrelation) -> stream slice + CFO
  derotation -> RX demod/decode (blind PCC + PDC turbo).

That mirrors lib/src/phy/rx/sync/sync_chunk.cpp:146-278 feeding
rx_synced.cpp:186-436 in the reference, which sustains exactly 1x real time
per channel on a tuned x86 host (README.md:9,224-230), so vs_baseline ==
real-time multiple. The aligned-packet multiple (round-1 metric, no sync
search) is reported in detail.

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

    from dectnrp_tpu.common.benchtime import fetch
    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.sync import build_sync, build_rx_stream
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
    n_pkt = ps.N_samples_packet

    B = 64 if on_tpu else 4
    iters = 10 if on_tpu else 2
    T = n_pkt + 8192            # stream length per channel (random offsets)

    tx = build_tx(psdef, nid, 1)
    rx = build_rx(psdef, nid, 1)
    sync = build_sync(psdef.u, psdef.b, T)
    rxs = build_rx_stream(psdef, nid, 1, T)

    rng = np.random.default_rng(0)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    nv = jnp.float32(10.0 ** (-15.0 / 10.0))

    @jax.jit
    def step_stream(plcf_bits, tb_bits, key, offsets):
        flags = jnp.zeros((plcf_bits.shape[0],), bool)
        iq = tx(plcf_bits, tb_bits, flags, flags)          # [B, 1, n_pkt]

        def scatter(off, pkt):
            z = jnp.zeros((pkt.shape[0], T), jnp.complex64)
            return jax.lax.dynamic_update_slice_in_dim(z, pkt, off, axis=-1)

        stream = jax.vmap(scatter)(offsets, iq)
        y = awgn(key, stream, nv)
        rep = sync(y)
        out = rxs(y, rep["t_fine"], rep["cfo"], nv)
        return out["tb_ok"], rep["detected"], rep["t_fine"]

    @jax.jit
    def step_aligned(plcf_bits, tb_bits, key):
        flags = jnp.zeros((plcf_bits.shape[0],), bool)
        iq = tx(plcf_bits, tb_bits, flags, flags)
        y = awgn(key, iq, nv)
        return rx(y, nv)["tb_ok"]

    def offsets_for(i):
        r = np.random.default_rng(1000 + i)
        return jnp.asarray(r.integers(0, T - n_pkt, (B,)), jnp.int32)

    # --- correctness gate at 15 dB SNR
    off0 = offsets_for(0)
    ok, det, t_fine = step_stream(plcf, tb, jax.random.PRNGKey(0), off0)
    terr = np.abs(np.asarray(t_fine) - np.asarray(off0))
    if not (bool(np.asarray(ok).all()) and bool(np.asarray(det).all())
            and int(terr.max()) <= 2):
        print(json.dumps({"metric": "loopback_stream_realtime_multiple",
                          "value": 0.0, "unit": "x_realtime",
                          "vs_baseline": 0.0,
                          "error": f"stream decode failed at 15 dB SNR "
                                   f"(ok={bool(np.asarray(ok).all())}, "
                                   f"det={bool(np.asarray(det).all())}, "
                                   f"terr_max={int(terr.max())})"}))
        sys.exit(1)

    # fetch-synced timing: block_until_ready does not wait on the tunneled
    # TPU backend; a host fetch of (a reduction of) the last output drains
    # the in-order dispatch queue (common/benchtime.py)
    fetch(step_stream(plcf, tb, jax.random.PRNGKey(0), off0))
    t0 = time.perf_counter()
    for i in range(iters):
        ok, det, tf = step_stream(plcf, tb, jax.random.PRNGKey(i + 1),
                                  offsets_for(i + 1))
    fetch(ok)
    dt_stream = time.perf_counter() - t0
    sps_stream = B * iters * T / dt_stream
    rt_stream = sps_stream / samp_rate

    # --- aligned-packet multiple (round-1 metric, detail only)
    ok_a = step_aligned(plcf, tb, jax.random.PRNGKey(0))
    if not bool(np.asarray(ok_a).all()):
        print(json.dumps({"metric": "loopback_stream_realtime_multiple",
                          "value": 0.0, "unit": "x_realtime",
                          "vs_baseline": 0.0,
                          "error": "aligned decode failed at 15 dB SNR"}))
        sys.exit(1)
    fetch(step_aligned(plcf, tb, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(iters):
        ok_a = step_aligned(plcf, tb, jax.random.PRNGKey(i + 1))
    fetch(ok_a)
    dt_aligned = time.perf_counter() - t0
    rt_aligned = B * iters * n_pkt / dt_aligned / samp_rate

    print(json.dumps({
        "metric": "loopback_stream_realtime_multiple",
        "value": round(rt_stream, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt_stream, 3),
        "detail": {
            "config": "u=1 b=16 4-slot MCS4 SISO stream loopback "
                      "(TX+AWGN+sync search+RX decode, random offsets)",
            "samples_per_s": round(sps_stream),
            "aligned_realtime_multiple": round(rt_aligned, 3),
            "dect_rate_hz": samp_rate,
            "stream_len": T, "packet_len": n_pkt,
            "batch": B, "iters": iters,
            "platform": dev.platform,
        },
    }))


if __name__ == "__main__":
    main()
