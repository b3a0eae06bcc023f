#!/usr/bin/env bash
# Run every bench family back-to-back and append one JSON line each to
# stdout (tunnel drift makes only adjacent runs comparable — this gives a
# same-window sweep). Usage: tools/bench_all.sh [extra bench.py args...]
set -u
cd "$(dirname "$0")/.."
for fam in qwen3-0.6b qwen2-0.5b llama3.2-1b minicpm4-0.5b qwen3-30b-a3b qwen3-vl; do
  echo "=== $fam ===" >&2
  timeout 2400 python bench.py --family "$fam" "$@"
done
