"""TPU probe: per-stage marginal cost of the u8b16 bench step at B=128.

Decomposes the ~100 ms step into tx / awgn / sync / slice+demod / fec so
the next optimization target is measured, not guessed (r05; sync was the
r04 target and is now ~8 ms of it).
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
    from dectnrp_tpu.phy.sync import build_rx_stream, build_sync
    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.phy.fec.chain import PdcPlan, pdc_decode
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)
    from dectnrp_tpu.simulation.channels import awgn

    psdef = PacketSizesDef(8, 16, 1, 1, 0, 4, 6144)
    ps = get_packet_sizes(psdef)
    nid = 0x12345678
    B, T = 128, 192512
    n_pkt = ps.N_samples_packet
    rng = np.random.default_rng(0)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "n_pkt": n_pkt, "N_TB_bits": int(ps.N_TB_bits),
                      "G": int(ps.G), "S": int(ps.N_PACKET_symb)}),
          flush=True)

    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    xs = (rng.standard_normal((B, 1, T))
          + 1j * rng.standard_normal((B, 1, T))).astype(np.complex64)
    xp = jnp.asarray(np.stack([xs.real, xs.imag]))
    xpk = (rng.standard_normal((B, 1, n_pkt))
           + 1j * rng.standard_normal((B, 1, n_pkt))).astype(np.complex64)
    xpkp = jnp.asarray(np.stack([xpk.real, xpk.imag]))
    t0s = jnp.asarray(rng.integers(0, T - n_pkt, B), jnp.int32)
    cfos = jnp.zeros((B,), jnp.float32)

    tx = build_tx(psdef, nid, 1)
    sync = build_sync(8, 16, T)
    rxs = build_rx_stream(psdef, nid, 1, T)
    rx = build_rx(psdef, nid, 1)
    plan = PdcPlan.get(ps.N_TB_bits, ps.G, ps.mcs.N_bps, psdef.Z)

    rows = {}

    def bench(name, f, args, iters=8):
        ms = synced_ms_marginal(jax.jit(f), args, iters=iters)
        rows[name] = round(ms, 3)
        print(json.dumps({name: rows[name]}), flush=True)

    fl = jnp.zeros((B,), bool)
    bench("tx_synthesis", lambda p, t: jnp.abs(tx(p, t, fl, fl)).sum(),
          (plcf, tb))
    bench("awgn_T", lambda p, k: jnp.abs(
        awgn(k, (p[0] + 1j * p[1]).astype(jnp.complex64),
             jnp.float32(0.03))).sum(), (xp, jax.random.PRNGKey(0)))
    bench("sync_full", lambda p: sync(
        (p[0] + 1j * p[1]).astype(jnp.complex64))["t_fine"], (xp,))
    bench("rx_stream_full", lambda p, t0, cf: rxs(
        (p[0] + 1j * p[1]).astype(jnp.complex64), t0, cf,
        jnp.float32(0.03))["tb_ok"], (xp, t0s, cfos))
    bench("rx_aligned_full", lambda p: rx(
        (p[0] + 1j * p[1]).astype(jnp.complex64),
        jnp.float32(0.03))["tb_ok"], (xpkp,))

    # FEC alone: random llrs at the exact PDC geometry
    llr = jnp.asarray(rng.standard_normal((B, ps.G)).astype(np.float32))
    bench("pdc_decode_only", lambda l: pdc_decode(l, plan, nid, 1,
                                                  n_iter=6)[1], (llr,),
          iters=6)

    print("RESULT " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
