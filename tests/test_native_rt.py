"""Native C++ host runtime: ring buffer, job queue, token, datagram queue.

Exercises the concurrency semantics the reference implements in C++
(buffer_rx wait_until_nto, job_queue fifo_cnt ordering, token lock_fifo,
datagram drop-on-overflow) through the ctypes bindings, including real
producer/consumer threads.
"""
from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from dectnrp_tpu.common.native import (NativeDatagramQueue, NativeJobQueue,
                                       NativeRingBuffer, NativeToken,
                                       native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


def test_ring_buffer_time_is_sample_counter():
    rb = NativeRingBuffer(capacity=1024, n_ant=2)
    assert rb.time == 0
    iq = (np.arange(2 * 100) + 1j * np.arange(2 * 100)[::-1]) \
        .reshape(2, 100).astype(np.complex64)
    rb.write(iq)
    assert rb.time == 100
    got = rb.read(0, 100)
    np.testing.assert_array_equal(got, iq)
    # wrap-around: write 10 more bursts then read a window crossing the seam
    for k in range(12):
        rb.write(iq * (k + 2))
    assert rb.time == 1300
    got = rb.read(1290, 10)
    np.testing.assert_array_equal(got, iq[:, 90:] * 13)
    # stale reads fail
    with pytest.raises(ValueError):
        rb.read(0, 10)
    # future reads fail
    with pytest.raises(ValueError):
        rb.read(1295, 10)


def test_ring_buffer_blocking_reader_thread():
    rb = NativeRingBuffer(capacity=4096, n_ant=1)
    got = {}

    def reader():
        t = rb.wait_until_nto(300)
        got["time"] = t
        got["data"] = rb.read(200, 100)

    th = threading.Thread(target=reader)
    th.start()
    time.sleep(0.05)
    assert th.is_alive()  # blocked: ring time still 0
    burst = np.full((1, 150), 1 + 1j, np.complex64)
    rb.write(burst)
    rb.write(burst * 2)
    th.join(timeout=2)
    assert not th.is_alive()
    assert got["time"] >= 300
    # [200, 300) lies entirely in the second burst (samples 150..299)
    np.testing.assert_array_equal(got["data"][0], burst[0, :100] * 2)
    rb.shutdown()
    assert rb.wait_until_nto(10_000) == -1


def test_job_queue_fifo_and_permeable():
    jq = NativeJobQueue(capacity=4)
    assert jq.enqueue(1, 10, 1000) == 0
    assert jq.enqueue(2, 20, 2000) == 1
    j = jq.dequeue()
    assert (j["fifo_cnt"], j["type"], j["handle"], j["time64"]) == (0, 1, 10, 1000)
    jq.set_permeable(False)
    assert jq.enqueue(3, 30) == -1          # gate closed
    jq.set_permeable(True)
    assert jq.enqueue(3, 30) == 2
    for _ in range(3):
        jq.enqueue(9, 9)
    assert jq.enqueue(9, 9) == -1           # full (capacity 4)
    assert jq.dequeue(timeout_us=0) is not None


def test_job_queue_mpmc_threads():
    jq = NativeJobQueue(capacity=10_000)
    N, NPROD = 500, 4
    seen = []
    lock = threading.Lock()

    def producer(pid):
        for i in range(N):
            while jq.enqueue(pid, i) < 0:
                time.sleep(0)

    def consumer():
        while True:
            j = jq.dequeue(timeout_us=200_000)
            if j is None:
                return
            with lock:
                seen.append((j["type"], j["handle"], j["fifo_cnt"]))

    prods = [threading.Thread(target=producer, args=(p,)) for p in range(NPROD)]
    cons = [threading.Thread(target=consumer) for _ in range(3)]
    for t in prods + cons:
        t.start()
    for t in prods:
        t.join()
    for t in cons:
        t.join()
    assert len(seen) == N * NPROD
    assert sorted(c for _, _, c in seen) == list(range(N * NPROD))
    per_pid = {p: [h for q, h, _ in seen if q == p] for p in range(NPROD)}
    for hs in per_pid.values():
        assert sorted(hs) == list(range(N))


def test_token_fifo_ordering():
    tok = NativeToken()
    order = []
    lock = threading.Lock()

    def worker(fifo_cnt):
        assert tok.lock_fifo(fifo_cnt, fifo_cnt, timeout_us=2_000_000)
        with lock:
            order.append(fifo_cnt)
        time.sleep(0.002)
        tok.unlock()

    # start out of order: 2, 0, 1 — token must admit 0, 1, 2
    threads = [threading.Thread(target=worker, args=(c,)) for c in (2, 0, 1)]
    for t in threads:
        t.start()
        time.sleep(0.01)
    for t in threads:
        t.join()
    assert order == [0, 1, 2]
    # plain lock still works after the fifo sequence
    assert tok.lock(7, timeout_us=100_000)
    tok.unlock()


def test_datagram_queue_drop_on_overflow():
    dq = NativeDatagramQueue(max_datagrams=2, max_bytes=64)
    assert dq.push(b"hello")
    assert dq.push(b"world")
    assert not dq.push(b"drop me")       # over datagram cap
    assert dq.dropped == 1
    assert dq.pop() == b"hello"
    assert not dq.push(b"x" * 60)        # over byte cap (5 bytes queued)
    assert dq.push(b"x" * 59)
    assert dq.pop() == b"world"
    assert dq.pop() == b"x" * 59
    assert dq.pop(timeout_us=0) is None


def test_datagram_queue_blocking_pop():
    dq = NativeDatagramQueue()
    res = {}

    def popper():
        res["d"] = dq.pop(timeout_us=2_000_000)

    th = threading.Thread(target=popper)
    th.start()
    time.sleep(0.02)
    dq.push(b"payload")
    th.join(timeout=2)
    assert res["d"] == b"payload"
