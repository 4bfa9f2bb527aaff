"""TPU probe: BCJR lane-tile width (CT) vs codeblock-batch padding.

Total native-tile work is Bp/128 regardless of CT, but the per-grid-step
scalar overhead (loop control, dynamic-slice addressing) amortizes over
CT, so wide tiles win even when padding inflates Bp. Measures the
K-group-2 shape (B=1408 -> CT=128 today) and the K=6144 group (B=2688 ->
CT=384) against padded-to-512 variants.
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
    from dectnrp_tpu.phy.fec.bcjr_pallas import bcjr_posterior_pallas_cm

    K = 6144
    rng = np.random.default_rng(0)
    for B in (1408, 1536, 2688, 3072, 2816):
        ls = jnp.asarray(rng.standard_normal((K + 3, B)).astype(np.float32))
        lp = jnp.asarray(rng.standard_normal((K + 3, B)).astype(np.float32))
        f = jax.jit(lambda a, b: bcjr_posterior_pallas_cm(a, b, K))
        ms = synced_ms_marginal(f, (ls, lp), iters=6)
        print(json.dumps({"B": B, "ms_per_pass": round(ms, 3),
                          "us_per_cb": round(ms * 1e3 / B, 2)}), flush=True)


if __name__ == "__main__":
    main()
