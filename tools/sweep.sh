#!/usr/bin/env bash
# 3-SF full-registry oracle sweep: runs graft.Verify + tools/selfcheck.py at
# sf0.001 / sf0.01 / sf0.1. The driver's gate only checks sf0.01; the round-10
# sweep caught two latent cross-engine divergences (percentile lerp-shape bin
# swaps, >2^53 DECIMAL→double drift) that ONLY manifest at other SFs — run
# this at least once per round before the end-of-round snapshot.
#
# Runs the compiled classes directly (no sbt lock) so it can run alongside an
# sbt session; build first: `sbt compile`. Subset dev loop: pass a comma-
# separated query list as $1 (default: full registry).
set -uo pipefail
cd "$(dirname "$0")/.."

ONLY="${1:-}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

rc=0
for sf in 0.001 0.01 0.1; do
  echo "=== sweep sf$sf ==="
  out="/tmp/sweep_sf$sf"
  rm -rf "$out"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  java $ADD_OPENS -Xmx32g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    graft.Verify "/root/testdata/sf$sf" "$out" $ONLY 2>/dev/null | grep '\[verify\]'
  if [ -n "$ONLY" ]; then
    python3 tools/selfcheck.py "/root/testdata/sf$sf" "$out" \
      | grep -v 'no spark output dir' || true
    # subset mode: selfcheck exit code counts missing dirs as failures; the
    # human reads the PASS/FAIL lines above instead
  else
    python3 tools/selfcheck.py "/root/testdata/sf$sf" "$out" | tail -3
    s=${PIPESTATUS[0]}
    [ "$s" -ne 0 ] && rc=1
  fi
done
if [ -z "$ONLY" ]; then
  [ "$rc" -eq 0 ] && echo "SWEEP GREEN (3 SFs, full registry)" || echo "SWEEP RED"
fi
exit $rc
