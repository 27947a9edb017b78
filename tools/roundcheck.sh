#!/usr/bin/env bash
# One-command round validation: the full battery the verify skill describes.
# Usage: bash tools/roundcheck.sh          (~25 min on local[32])
# Runs every stage, prints a per-stage verdict, exits non-zero if ANY
# stage failed. pipefail is load-bearing: without it the `| tail` pipes
# would swallow the tools' exit codes.
set -u -o pipefail
cd "$(dirname "$0")/.."
fail=0
stage() { echo "=== $1"; }

stage "pytest (full suite)"
python -m pytest tests/ -q || fail=1

stage "oracle sweep sf0.01 (the driver gate, emulated)"
python tools/verify_local.py /root/testdata/sf0.01 | tail -3 || fail=1

stage "oracle sweep sf0.1 (scale-robustness)"
python tools/verify_local.py /root/testdata/sf0.1 | tail -3 || fail=1

stage "bench (writes bench_results.json; compare vs BENCH_r*.json)"
python bench.py | tail -1 || fail=1

stage "plan report (rewrites PLANS.md; diff before committing)"
python tools/plan_report.py | tail -1 || fail=1

[ "$fail" -eq 0 ] && echo "ROUNDCHECK: ALL STAGES GREEN" || echo "ROUNDCHECK: FAILURES ABOVE"
exit $fail
