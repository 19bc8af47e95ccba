#!/bin/bash
# Test-run attestation (dev tooling only — NOT part of the engine).
#
# Runs the full ScalaTest suite and writes TESTRUN.txt recording
#   - a sha256 over the CONTENTS of src/ (sorted file list, file
#     hashes hashed together) — content-addressed, so it attests the
#     exact source the suite ran against regardless of git state;
#   - the sbt exit code and the suite summary lines.
#
# tools/closeout.py recomputes the same hash from the checked-out tree
# and refuses the round close unless TESTRUN.txt matches it with a
# green summary — closing the round-15 gate hole where engine code
# landing in the final snapshot commit passed the close vacuously
# (no registry entry, so the sweep!=registry check never saw it).
set -uo pipefail
cd "$(dirname "$0")/.."

sbt -batch test >/tmp/graft_testrun.log 2>&1
rc=$?
summary=$(grep -E "Tests: succeeded|All tests passed|Failed: " /tmp/graft_testrun.log | tail -4)
# -print0/-0 so paths with spaces/specials can't split or truncate the
# list (closeout.py's python twin walks the same tree — one recipe)
hash=$(cd src && find . -type f -print0 | LC_ALL=C sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1)
{
  echo "src_sha256 $hash"
  echo "exit_code $rc"
  echo "ran_at $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "$summary"
} > TESTRUN.txt
cat TESTRUN.txt
exit $rc
