"""TPU probe: u8b16 realtime multiple vs batch (r05 follow-up).

r04 measured 0.47x@16 / 0.97x@64 / 1.19x@128 (idle); with the fused
detection kernel the step is turbo-decode-dominated, so larger batches
amortize the remaining fixed cost. Uses bench.py's own _run_config.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from bench import _run_config
    from dectnrp_tpu.common.benchtime import fetch
    from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef

    psdef_t = PacketSizesDef(8, 16, 1, 1, 0, 4, 6144)
    rate_t = 1_728_000 * 8 * 16
    for B in (128, 256):
        r = _run_config("u8b16_siso_mcs4", psdef_t, 2, 1, False, B, 8,
                        0x12345678, rate_t, fetch)
        print(json.dumps({"B": B,
                          "rt": r.get("realtime_multiple"),
                          "ok": r.get("decode_ok_frac"),
                          "err": r.get("error")}), flush=True)


if __name__ == "__main__":
    main()
