#!/usr/bin/env bash
# A/B bench: compare the working tree's compiled binary against REF on an
# isolated query list IN THE SAME WINDOW — the adjudication device behind
# TUNE_r19's regression table, as one command. Round-over-round grids run
# in different host windows, so a raw diff confounds code with window;
# this harness checks the REF binary out in a worktree, compiles it, and
# interleaves ref/cur bench runs back-to-back so both binaries see the
# same window. Window drift then shows up as disagreement between a
# binary's own two runs, not as a phantom code regression.
#
# Usage: tools/ab_bench.sh <ref> <q1,q2,...> [sfdir] [repeats]
#   ref       any git ref (the r18 closeout commit, a tag, HEAD~5, ...)
#   queries   comma-separated SparkEntry query names (isolated set)
#   sfdir     testdata dir          (default /root/testdata/sf0.1)
#   repeats   per-run Bench repeats (default 3, interleaved inside Bench)
# Env: SPARK_JARS_DIR (default /opt/spark/jars), SPARK_GRAFT_CPUS (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:?usage: ab_bench.sh <ref> <q1,q2,...> [sfdir] [repeats]}"
QUERIES="${2:?query list required (comma-separated SparkEntry names)}"
SFDIR="${3:-/root/testdata/sf0.1}"
REPEATS="${4:-3}"
SPARK_JARS_DIR="${SPARK_JARS_DIR:-/opt/spark/jars}"
CPUS="${SPARK_GRAFT_CPUS:-8}"

SHORT=$(git rev-parse --short "$REF")
WT="/tmp/graft_ab_$SHORT"
if [ ! -d "$WT" ]; then
  echo "== worktree for $REF at $WT =="
  git worktree add --detach "$WT" "$REF" > /dev/null
fi
echo "== compiling current tree =="
sbt -batch compile > /dev/null
echo "== compiling $REF =="
(cd "$WT" && sbt -batch compile > /dev/null)

# mirror build.sbt's jdk17AddOpens: without java.base/java.nio etc. the
# Kryo-broadcasting ANN queries (q49/q130/q137) fail on a bare JVM
JAVA_OPTS="-Dderby.system.home=/tmp/ab_derby"
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net          java.nio java.util java.util.concurrent java.util.concurrent.atomic          sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JAVA_OPTS="$JAVA_OPTS --add-opens=java.base/$p=ALL-UNNAMED"
done
run() { # $1 = classes dir, $2 = artifact path
  rm -f "$2"
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_REPEATS="$REPEATS" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $JAVA_OPTS -cp "$1:$SPARK_JARS_DIR/*" graft.Bench > /dev/null 2>&1 || true
  if [ ! -f "$2" ]; then
    echo "FAIL: bench run for classes=$1 produced no artifact"
    exit 1
  fi
}

echo "== A/B in one window: ref, cur, ref, cur =="
run "$WT/target/scala-2.13/classes" /tmp/ab_ref1.json
run "target/scala-2.13/classes"     /tmp/ab_cur1.json
run "$WT/target/scala-2.13/classes" /tmp/ab_ref2.json
run "target/scala-2.13/classes"     /tmp/ab_cur2.json

python3 tools/ab_table.py \
  /tmp/ab_ref1.json /tmp/ab_ref2.json /tmp/ab_cur1.json /tmp/ab_cur2.json
