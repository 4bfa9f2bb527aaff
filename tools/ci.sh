#!/bin/sh
# CI entry (reference analog: CTest + ASAN/TSAN/valgrind lattice,
# CMakeLists.txt:59-78,263-265 — here: bytecode check, the CPU-mesh suite,
# native-runtime build+tests, and the TPU kernel job when a chip is visible).
set -e
cd "$(dirname "$0")/.."

echo "== compileall (syntax/bytecode)"
python -m compileall -q dectnrp_tpu tools tests tests_tpu bench.py __graft_entry__.py

echo "== unit+system suite (virtual 8-dev CPU mesh)"
python -m pytest tests/ -q

echo "== TPU kernel regression job (skips off-TPU)"
python -m pytest tests_tpu/ -q

echo "CI OK"
