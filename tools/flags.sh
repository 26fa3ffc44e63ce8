#!/usr/bin/env bash
# Automated bench-flag adjudication (VERDICT r21 #10): every query whose
# final-grid median regressed more than THRESHOLD× against the baseline
# grid gets re-run through tools/ab_bench.sh — ref and current binaries
# interleaved IN ONE WINDOW — so "window noise" claims are reproduced by
# machinery instead of argued by hand. Output: the flag list with grid
# ratios, then ab_table.py's in-window adjudication table.
#
# Usage: tools/flags.sh <baseline.json> <final.json> <ref> [threshold] [batch]
#   baseline.json  committed grid at round start (full Bench artifact)
#   final.json     committed grid after the changes
#   ref            git ref whose binary adjudicates (usually the round-start commit)
#   threshold      flag ratio (default 1.25)
#   batch          max queries per ab_bench invocation (default 12)
set -euo pipefail
cd "$(dirname "$0")/.."
BASE="${1:?usage: flags.sh <baseline.json> <final.json> <ref> [threshold] [batch]}"
FINAL="${2:?final grid artifact required}"
REF="${3:?git ref required}"
THRESH="${4:-1.25}"
BATCH="${5:-12}"

FLAGS=$(python3 - "$BASE" "$FINAL" "$THRESH" <<'EOF'
import json, sys
base = json.load(open(sys.argv[1]))["queries"]
final = json.load(open(sys.argv[2]))["queries"]
th = float(sys.argv[3])
flags = []
for q, b in sorted(base.items()):
    f = final.get(q)
    if f is not None and b > 0 and f / b > th:
        flags.append((q, b, f, f / b))
print(f"== {len(flags)} queries regressed >{th}x in the grid ==",
      file=sys.stderr)
for q, b, f, r in flags:
    print(f"  {q:34} {b:8.3f} -> {f:8.3f}  x{r:.2f}", file=sys.stderr)
print(",".join(q for q, *_ in flags))
EOF
)
if [ -z "$FLAGS" ]; then
  echo "== no queries over threshold — nothing to adjudicate =="
  exit 0
fi
# batch the flag list so one ab_bench run stays short enough to share a window
echo "$FLAGS" | tr ',' '\n' | xargs -n "$BATCH" | tr ' ' ',' | while read -r chunk; do
  echo "== adjudicating: $chunk =="
  tools/ab_bench.sh "$REF" "$chunk"
done
