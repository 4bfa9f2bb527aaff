"""Fixed-size lockable datagram queue (reference application/queue/queue.cpp).

The reference preallocates `nof_datagrams` slots of `datagram_max_byte` each
behind a spinlock; writers drop on overflow (real-time policy), readers
drain in FIFO order. Here: a bounded deque + lock, same drop-on-overflow
semantics and byte-size cap.
"""
from __future__ import annotations

import threading
from collections import deque


class DatagramQueue:
    def __init__(self, nof_datagrams: int = 64,
                 datagram_max_bytes: int = 2048):
        self.nof_datagrams = nof_datagrams
        self.datagram_max_bytes = datagram_max_bytes
        self._dq: deque[bytes] = deque()
        self._lock = threading.Lock()
        self.dropped = 0
        self.pushed = 0

    def write(self, datagram: bytes) -> bool:
        """FIFO push; drops (returns False) when full or oversized."""
        if len(datagram) > self.datagram_max_bytes:
            self.dropped += 1
            return False
        with self._lock:
            if len(self._dq) >= self.nof_datagrams:
                self.dropped += 1
                return False
            self._dq.append(bytes(datagram))
            self.pushed += 1
            return True

    def read(self) -> bytes | None:
        with self._lock:
            return self._dq.popleft() if self._dq else None

    def read_all(self) -> list[bytes]:
        with self._lock:
            out = list(self._dq)
            self._dq.clear()
            return out

    def __len__(self) -> int:
        with self._lock:
            return len(self._dq)

    @property
    def used_bytes(self) -> int:
        with self._lock:
            return sum(len(d) for d in self._dq)
