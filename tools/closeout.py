#!/usr/bin/env python3
"""Round close-out gate (dev tooling only — NOT part of the engine).

Asserts the committed full-registry sweep files cover the CURRENT
registry, both directions, with zero failures — so a query registered
after the sweep ran (the round-14 process foul) or a sweep line for a
since-removed query fails the round close loudly.

Usage: python3 tools/closeout.py <round> [names_file]
  <round>      e.g. 15 — checks CHECK_SF0.001_r<N>.txt and
               CHECK_SF0.01_r<N>.txt in the repo root
  [names_file] one registry name per line (output of
               `sbt "runMain graft.Names"`); if omitted, sbt is invoked

Exit 0 only if: both sweep files exist, neither contains a FAIL line,
each file's query-name set equals the registry exactly, AND
TESTRUN.txt (written by tools/attest.sh) attests a green full-suite
run over EXACTLY the current src/ contents — so engine code landing in
a final snapshot commit without a re-run of the suite (the round-14/15
foul shape) fails the close loudly instead of passing vacuously.
"""
import hashlib
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"^\[(PASS\s*|rows-only|FAIL[^\]]*)\]\s+(\S+):")


def sweep_names(path):
    names, fails = set(), []
    with open(path) as f:
        for raw in f:
            m = LINE.match(raw.strip())
            if not m:
                continue
            tag, name = m.group(1).strip(), m.group(2)
            if tag.startswith("FAIL"):
                fails.append(f"{name} [{tag}]")
            else:
                names.add(name)
    return names, fails


def registry_names(names_file):
    if names_file:
        with open(names_file) as f:
            return {l.strip() for l in f if l.strip()}
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Names"],
        cwd=ROOT, capture_output=True, text=True, check=True).stdout
    # sbt interleaves [info]/[success] lines; registry names are bare
    # identifiers on their own line, anchored to the registry's four
    # family prefixes (q/d/e/m + underscore-bearing tail) so a stray
    # bare word in sbt output can never inflate the registry.
    return {l.strip() for l in out.splitlines()
            if re.fullmatch(r"[qdem][a-z0-9]*_[a-z0-9_]+", l.strip())}


def src_sha256():
    """Content hash over src/ — the exact recipe tools/attest.sh uses:
    sha256 of each file's sha256 line, over the LC_ALL=C-sorted
    relative path list."""
    src = os.path.join(ROOT, "src")
    paths = []
    for dirpath, _, files in os.walk(src):
        for f in files:
            full = os.path.join(dirpath, f)
            paths.append("./" + os.path.relpath(full, src))
    lines = []
    for p in sorted(paths):  # LC_ALL=C byte sort == python str sort here
        with open(os.path.join(src, p), "rb") as f:
            h = hashlib.sha256(f.read()).hexdigest()
        lines.append(f"{h}  {p}\n")
    return hashlib.sha256("".join(lines).encode()).hexdigest()


def testrun_check():
    """TESTRUN.txt must attest a green suite over the CURRENT src/."""
    path = os.path.join(ROOT, "TESTRUN.txt")
    if not os.path.exists(path):
        return ["missing TESTRUN.txt — run tools/attest.sh after the "
                "final source change"]
    with open(path) as f:
        txt = f.read()
    errs = []
    m = re.search(r"^src_sha256 ([0-9a-f]{64})$", txt, re.M)
    if not m:
        errs.append("TESTRUN.txt has no src_sha256 line")
    elif m.group(1) != src_sha256():
        errs.append("TESTRUN.txt attests a DIFFERENT src/ tree — source "
                    "changed after the last suite run; re-run tools/attest.sh")
    rc = re.search(r"^exit_code (\d+)$", txt, re.M)
    if not rc or rc.group(1) != "0":
        errs.append(f"TESTRUN.txt suite run was not green "
                    f"(exit_code {rc.group(1) if rc else '?'})")
    return errs


def main():
    if len(sys.argv) < 2:
        print("usage: python3 tools/closeout.py <round> [names_file]")
        return 2
    rnd = sys.argv[1]
    names_file = sys.argv[2] if len(sys.argv) > 2 else None
    registry = registry_names(names_file)
    if not registry:
        print("[closeout] FAIL: empty registry listing")
        return 1
    bad = 0
    for sf in ("0.001", "0.01"):
        path = os.path.join(ROOT, f"CHECK_SF{sf}_r{rnd}.txt")
        if not os.path.exists(path):
            print(f"[closeout] FAIL: missing sweep file {path}")
            bad += 1
            continue
        swept, fails = sweep_names(path)
        for f in fails:
            print(f"[closeout] FAIL: {os.path.basename(path)} red row: {f}")
            bad += 1
        for name in sorted(registry - swept):
            print(f"[closeout] FAIL: {name} registered but not in "
                  f"{os.path.basename(path)} — re-run the sweep")
            bad += 1
        for name in sorted(swept - registry):
            print(f"[closeout] FAIL: {name} swept in "
                  f"{os.path.basename(path)} but no longer registered")
            bad += 1
        if not fails and swept == registry:
            print(f"[closeout] ok: CHECK_SF{sf}_r{rnd}.txt covers all "
                  f"{len(registry)} registered queries, 0 failures")
    for err in testrun_check():
        print(f"[closeout] FAIL: {err}")
        bad += 1
    if not bad:
        print("[closeout] ok: TESTRUN.txt attests a green suite over the "
              "current src/ tree")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
