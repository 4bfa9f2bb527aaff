"""TPU probe: pdc_dematch vs turbo iterations split at u8b16 B=128."""
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
    from dectnrp_tpu.phy.fec.chain import (PdcPlan, pdc_dematch, pdc_decode_d,
                                           pdc_encode)
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode_early
    from dectnrp_tpu.phy.fec.crc import POLY_CRC24B, crc_matrix
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)

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

    dem = jax.jit(lambda l: pdc_dematch(l, plan, nid, 1)[plan.cb_K[0]])
    ms = synced_ms_marginal(dem, (llr,), iters=6)
    print(json.dumps({"dematch_ms": round(ms, 3)}), flush=True)

    d_by_k = jax.jit(lambda l: pdc_dematch(l, plan, nid, 1))(llr)
    d_by_k = {k: jnp.asarray(v) for k, v in d_by_k.items()}
    K = plan.cb_K[0]
    m_k = crc_matrix(K - 24, POLY_CRC24B)

    te = jax.jit(lambda d: turbo_decode_early(d, jnp.asarray(m_k), K,
                                              n_iter_max=6, n_iter_min=2)[2])
    ms = synced_ms_marginal(te, (d_by_k[K],), iters=6)
    nb = d_by_k[K].shape[0]
    print(json.dumps({"turbo_early_ms": round(ms, 3), "n_cbs": nb}),
          flush=True)

    dec_d = jax.jit(lambda d: pdc_decode_d(d, plan, n_iter=6)[1])
    ms = synced_ms_marginal(dec_d, (d_by_k,), iters=6)
    print(json.dumps({"pdc_decode_d_ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
