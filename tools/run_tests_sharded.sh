#!/usr/bin/env bash
# Run the pytest suite as N parallel shards (default 3), each with its own
# session-scoped Ray cluster (num_cpus=4 per conftest.py), cutting suite
# wall ~Nx on a 32-core box.  Shards split test FILES round-robin, so every
# file keeps its own in-file ordering.  Exit status is non-zero if any
# shard fails; per-shard logs land in /tmp/pytest_shard_<i>.out.
#
# Serial equivalent (the judge/driver protocol): python -m pytest tests/ -x -q
set -u
cd "$(dirname "$0")/.."
N="${1:-3}"
pids=()
for i in $(seq 1 "$N"); do
  files=$(ls tests/test_*.py | awk -v n="$N" -v i="$i" 'NR % n == i - 1')
  # shellcheck disable=SC2086
  python -m pytest $files -q > "/tmp/pytest_shard_$i.out" 2>&1 &
  pids+=($!)
done
rc=0
for i in $(seq 1 "$N"); do
  wait "${pids[$((i - 1))]}" || rc=1
  tail -1 "/tmp/pytest_shard_$i.out"
done
exit "$rc"
