#!/bin/bash
# End-of-round snapshot wrapper (dev tooling only — NOT part of the
# engine). The r14–r17 process foul, four rounds running, was engine
# code landing in a final snapshot commit AFTER the last attestation,
# so the merged tree was never the tree the recorded gates ran on.
# This wrapper makes that impossible by construction: it runs the FULL
# gate stack over the tree as it stands — suite attestation, both
# registry sweeps, the close-out check — and only then commits, in one
# breath, with a post-commit invariant that HEAD's src/ hash equals
# TESTRUN.txt's. Any nonzero step aborts before the commit.
#
# Usage: tools/snapshot.sh <round> "<commit message>"
#   e.g.: tools/snapshot.sh 18 "round 18: end-of-round snapshot"
#
# Rule of engagement: NOTHING under src/ may change after this script
# starts. If it does, the post-commit invariant fails loudly.
set -euo pipefail
cd "$(dirname "$0")/.."
round=${1:?round number required}
msg=${2:?commit message required}

echo "[snapshot] 1/5 attesting full suite over the current tree"
tools/attest.sh

echo "[snapshot] 2/5 registry sweep at sf0.001"
rm -rf /tmp/snap_v001
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.001 /tmp/snap_v001" \
  > /tmp/snap_verify001.log 2>&1
{
  echo "# CHECK_SF0.001_r${round} — full-registry correctness sweep at sf0.001 (round-${round})"
  echo "#"
  echo "# Protocol: graft.Verify dumped every SparkEntry.queries entry at"
  echo "# /root/testdata/sf0.001; tools/check.py replayed each oracle in DuckDB"
  echo "# (rows / schema / value-hash compare after column-name sort)."
  python3 tools/check.py /tmp/snap_v001 /root/testdata/sf0.001
} > "CHECK_SF0.001_r${round}.txt"

echo "[snapshot] 3/5 registry sweep at sf0.01"
rm -rf /tmp/snap_v01
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/snap_v01" \
  > /tmp/snap_verify01.log 2>&1
{
  echo "# CHECK_SF0.01_r${round} — full-registry correctness sweep at sf0.01 (round-${round})"
  echo "#"
  echo "# Protocol: graft.Verify dumped every SparkEntry.queries entry at"
  echo "# /root/testdata/sf0.01; tools/check.py replayed each oracle in DuckDB"
  echo "# (rows / schema / value-hash compare after column-name sort)."
  python3 tools/check.py /tmp/snap_v01 /root/testdata/sf0.01
} > "CHECK_SF0.01_r${round}.txt"

echo "[snapshot] 4/5 close-out gate (+ third-engine ilog law check)"
python3 tools/ilog_check.py /tmp/snap_v01
python3 tools/closeout.py "${round}"

echo "[snapshot] 5/5 committing the attested tree"
git add -A
if git diff --cached --quiet; then
  echo "[snapshot] nothing to commit — tree already snapshotted"
else
  git commit -m "${msg}"
fi

# Post-commit invariant: the committed src/ IS the attested src/.
attested=$(grep -oP '^src_sha256 \K[0-9a-f]{64}' TESTRUN.txt)
actual=$(cd src && find . -type f -print0 | LC_ALL=C sort -z \
  | xargs -0 sha256sum | sha256sum | cut -d' ' -f1)
if [ "$attested" != "$actual" ]; then
  echo "[snapshot] FATAL: src/ changed between attestation and commit" >&2
  echo "[snapshot]   attested $attested" >&2
  echo "[snapshot]   actual   $actual" >&2
  exit 1
fi
dirty=$(git status --porcelain)
if [ -n "$dirty" ]; then
  echo "[snapshot] FATAL: working tree dirty after snapshot commit:" >&2
  echo "$dirty" >&2
  exit 1
fi
echo "[snapshot] OK — HEAD is the attested tree (src_sha256 $actual)"
