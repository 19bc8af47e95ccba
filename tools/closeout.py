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
and each file's query-name set equals the registry exactly.
"""
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
    # lowercase identifiers on their own line.
    return {l.strip() for l in out.splitlines()
            if re.fullmatch(r"[a-z][a-z0-9_]+", l.strip())}


def main():
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
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
