#!/usr/bin/env bash
# Two-PROCESS commit race: forks two JVMs staging the SAME transaction
# id under writer-unique nonces against one store root, lets them race
# the atomic commit claim, then audits that exactly one won and the
# reader is clean. The cross-JVM companion of TxStoreSpec's two-thread
# race ("two-writer commit race under real concurrency") — proves the
# hard-link / O_EXCL arbitration holds across separate processes, not
# just threads sharing one JVM.
#
# Usage: tools/commit_race.sh   (from the repo root; needs target/
#        compiled — run `sbt compile` first)
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JAVA_OPTS="--add-exports=java.base/sun.nio.ch=ALL-UNNAMED -Dderby.system.home=/tmp/race_derby"

echo "== prep (reset + pristine bases) =="
java $JAVA_OPTS -cp "$CP" graft.tools.CommitRace prep

echo "== race: two JVMs, one txn id =="
java $JAVA_OPTS -cp "$CP" graft.tools.CommitRace race A > /tmp/race_A.log 2>&1 &
PA=$!
java $JAVA_OPTS -cp "$CP" graft.tools.CommitRace race B > /tmp/race_B.log 2>&1 &
PB=$!
wait $PA $PB
grep -h RACE_RESULT /tmp/race_A.log /tmp/race_B.log

WINNERS=$(grep -h "outcome=winner" /tmp/race_A.log /tmp/race_B.log | wc -l)
LOSERS=$(grep -h "outcome=loser" /tmp/race_A.log /tmp/race_B.log | wc -l)
if [ "$WINNERS" != "1" ] || [ "$LOSERS" != "1" ]; then
  echo "FAIL: expected exactly one winner and one loser (winners=$WINNERS losers=$LOSERS)"
  exit 1
fi

echo "== check (one commit, clean reader, orphan vacuumed) =="
java $JAVA_OPTS -cp "$CP" graft.tools.CommitRace check
echo "COMMIT_RACE pass"
