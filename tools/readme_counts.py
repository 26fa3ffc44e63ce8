#!/usr/bin/env python3
"""Regenerate README.md's countable claims from the artifacts themselves.

Usage: python3 tools/readme_counts.py [sbt-test-log]

Reads the newest CORRECTNESS_r*.json (query/oracle counts) and the sbt
test log (test/suite counts; pass a saved log, else runs `sbt -batch test`)
and rewrites the marked lines in README.md. Hand-editing those numbers is
how they went stale four rounds running — don't; run this instead.
"""
import glob, json, re, subprocess, sys

def sbt_test_output(argv):
    if len(argv) > 1:
        return open(argv[1]).read()
    return subprocess.run(["sbt", "-batch", "test"], capture_output=True,
                          text=True, check=True).stdout

log = sbt_test_output(sys.argv)
tests = re.search(r"Total number of tests run: (\d+)", log).group(1)
suites = re.search(r"Suites: completed (\d+)", log).group(1)

latest = max(glob.glob("CORRECTNESS_r*.json"),
             key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
cj = json.load(open(latest))
total = len(cj)
oracled = sum(1 for v in cj.values() if v.get("hash_match"))
rows_only = sum(1 for v in cj.values() if v.get("err") == "no_oracle")

readme = open("README.md").read()
readme = re.sub(r"sbt test( +)# \d+ tests, \d+ suites",
                rf"sbt test\g<1># {tests} tests, {suites} suites", readme)
readme = re.sub(r"Correctness: \d+ of \d+ queries",
                f"Correctness: {oracled} of {total} queries", readme)
open("README.md", "w").write(readme)
print(f"README.md: {tests} tests / {suites} suites; "
      f"{oracled}/{total} oracled ({latest}); {rows_only} rows-only")
