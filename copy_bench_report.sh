#!/usr/bin/env bash
# Copy the latest bench results + profiler traces into report/, pruning raw
# per-run sample dirs — the analog of the reference's copy_bench_report.sh:1-8.
set -euo pipefail
cd "$(dirname "$0")"
SRC=${1:-profile}
DST=${2:-report}
mkdir -p "$DST"
[ -f "$SRC/results.json" ] && cp "$SRC/results.json" "$DST/"
# keep only the newest trace per group
for g in "$SRC"/*/; do
    [ -d "$g" ] || continue
    name=$(basename "$g")
    mkdir -p "$DST/$name"
    latest=$(ls -t "$g"/plugins/profile 2>/dev/null | head -1 || true)
    if [ -n "$latest" ]; then
        cp -r "$g/plugins/profile/$latest" "$DST/$name/"
    fi
done
echo "report copied to $DST/"
