"""Channel occupancy scanner (reference lib/src/phy/rx/chscan/).

chscanner_t measures per-antenna RMS over a time window of the RX ring,
split into N partial scans with ring-wrap handling
(chscanner.cpp:38-141). Here the window is fetched from the host ring
and the RMS reduction runs as one jit over [n_partial, len, ant].
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np


@dataclass
class Chscan:
    """Scan request/result (reference chscan_t)."""
    t_start: int
    t_end: int
    n_partial: int = 1
    rms_ant: np.ndarray | None = None      # [n_ant] linear RMS
    rms_partial: np.ndarray | None = None  # [n_partial, n_ant]

    @property
    def done(self) -> bool:
        return self.rms_ant is not None

    def rms_dB(self) -> np.ndarray:
        return 20.0 * np.log10(np.maximum(self.rms_ant, 1e-12))


@lru_cache(maxsize=None)
def _build_rms(n_partial: int, part_len: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rms(iq):                       # [n_partial, part_len, n_ant] cf32
        p = jnp.mean(jnp.abs(iq) ** 2, axis=1)          # [n_partial, n_ant]
        return jnp.sqrt(p), jnp.sqrt(jnp.mean(p, axis=0))

    return rms


class Chscanner:
    """Runs Chscans against a hardware's RX ring (host-side pacing,
    device-side reduction)."""

    def __init__(self, hw):
        self.hw = hw

    def scan(self, chscan: Chscan) -> Chscan | None:
        """Executes the scan if all samples are available, else None."""
        if chscan.t_end > self.hw.rx_time_passed:
            return None
        total = chscan.t_end - chscan.t_start
        part = total // chscan.n_partial
        if part == 0:
            return None
        win = self.hw.get_rx_stream(chscan.t_start,
                                    part * chscan.n_partial)
        # hw ring is [A, n]; reduction wants [n_partial, part, A]
        iq = np.ascontiguousarray(win.T).reshape(chscan.n_partial, part, -1)
        rms = _build_rms(chscan.n_partial, part)
        import jax.numpy as jnp
        part_rms, ant_rms = rms(jnp.asarray(iq))
        chscan.rms_partial = np.asarray(part_rms)
        chscan.rms_ant = np.asarray(ant_rms)
        return chscan
