"""TPU probe: realistic (early-stop) PDC decode + rx stage split at u8b16.

pdc_decode on DECODABLE LLRs exercises the CRC-gated early exit (2
iterations), unlike the random-LLR worst case (6 iterations, 128 ms).
Together with rx_aligned timing on real packets this pins down where the
~100 ms u8b16 B=128 step actually goes.
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
    from dectnrp_tpu.phy.fec.chain import PdcPlan, pdc_decode, pdc_encode
    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)
    from dectnrp_tpu.simulation.channels import awgn

    psdef = PacketSizesDef(8, 16, 1, 1, 0, 4, 6144)
    ps = get_packet_sizes(psdef)
    nid = 0x12345678
    B = 128
    rng = np.random.default_rng(0)
    plan = PdcPlan.get(ps.N_TB_bits, ps.G, ps.mcs.N_bps, psdef.Z)

    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    enc = jax.jit(lambda t: pdc_encode(t, plan, nid, 1))
    e = np.asarray(enc(tb))
    llr = jnp.asarray(np.where(e > 0, 4.0, -4.0).astype(np.float32))
    dec = jax.jit(lambda l: pdc_decode(l, plan, nid, 1, n_iter=6)[1])
    okf = float(np.asarray(dec(llr)).mean())
    ms = synced_ms_marginal(dec, (llr,), iters=6)
    print(json.dumps({"pdc_decode_earlystop_ms": round(ms, 3),
                      "ok_frac": okf}), flush=True)

    # rx aligned on REAL decodable packets at 15 dB (PLCF bits random —
    # the PDC path is what's timed and it does not depend on PCC content)
    tx = build_tx(psdef, nid, 1)
    rx = build_rx(psdef, nid, 1)
    pb = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    fl = jnp.zeros((B,), bool)

    @jax.jit
    def make(pb, tb, key):
        iq = tx(pb, tb, fl, fl)
        sig = jnp.mean(jnp.abs(iq) ** 2)
        nv = sig / 10.0 ** 1.5
        y = awgn(key, iq, nv)
        return jnp.stack([jnp.real(y), jnp.imag(y)]), nv

    yp, nv = make(pb, tb, jax.random.PRNGKey(0))

    @jax.jit
    def rx_full(p, nv):
        return rx((p[0] + 1j * p[1]).astype(jnp.complex64), nv)["tb_ok"]

    okf = float(np.asarray(rx_full(yp, nv)).mean())
    ms = synced_ms_marginal(rx_full, (yp, nv), iters=6)
    print(json.dumps({"rx_aligned_real_ms": round(ms, 3),
                      "ok_frac": okf}), flush=True)

    # tx alone (no reduction wrapper bias: sum of one plane)
    txj = jax.jit(lambda pb, tb: jnp.sum(jnp.real(tx(pb, tb, fl, fl))))
    ms = synced_ms_marginal(txj, (pb, tb), iters=8)
    print(json.dumps({"tx_only_ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
