#!/usr/bin/env bash
# Run every bench group with the jax.profiler trace hook attached —
# the analog of the reference's bench_all_with_flamegraph.sh:1-8 (criterion
# --profile-time with the pprof flamegraph profiler).
set -euo pipefail
cd "$(dirname "$0")"
OUT=${1:-profile}
python -m kzg_tpu.bench.harness --sizes "${SIZES:-16,64,128,256}" \
    --profile-dir "$OUT" --json "$OUT/results.json"
echo "traces + results under $OUT/ (open with xprof or ui.perfetto.dev)"
