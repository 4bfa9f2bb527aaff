"""Run the PER-vs-SNR oracle sweep and save reference-schema JSON curves.

Reference oracle: lib/src/upper/loopback/tfw_loopback_snr.cpp:34-187 —
MCS 1..6 x SNR -2..20 dB x 100 packets, one JSON per MCS. Two variants are
produced: "sync" (packets at random offsets in a stream, full sync search
before decode — the reference's actual signal path) and "aligned" (perfect
timing, isolates the FEC/demod waterfall).

Usage: python tools/run_loopback_snr.py [out_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "results/loopback_snr"
    from dectnrp_tpu.upper.loopback import LoopbackSnrExperiment

    meta = {}
    for use_sync, name in ((True, "sync"), (False, "aligned")):
        t0 = time.perf_counter()
        exp = LoopbackSnrExperiment(use_sync=use_sync)
        paths = exp.save_json(os.path.join(out_root, name))
        dt = time.perf_counter() - t0
        meta[name] = {"files": [os.path.basename(p) for p in paths],
                      "wall_s": round(dt, 1),
                      "n_per_snr": exp.n_per_snr,
                      "snr_db": list(exp.snr_db),
                      "mcs": list(exp.mcs_list)}
        print(f"{name}: {len(paths)} curves in {dt:.1f}s")
    import jax
    meta["platform"] = jax.devices()[0].platform
    with open(os.path.join(out_root, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


if __name__ == "__main__":
    main()
