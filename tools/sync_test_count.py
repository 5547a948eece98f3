#!/usr/bin/env python3
"""Sync README.md's advertised test count from a real `sbt test` run.

Usage: sbt -batch test | tee /tmp/sbt_test.log ; python3 tools/sync_test_count.py /tmp/sbt_test.log

Reads the ScalaTest summary line ("Total number of tests run: N") from
the given log and rewrites the `sbt test` comment in README.md, so the
count can never go stale by hand-editing (it has, twice).
"""
import re
import sys

log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbt_test.log"
with open(log_path) as f:
    counts = re.findall(r"Total number of tests run: (\d+)", f.read())
if not counts:
    sys.exit(f"no ScalaTest summary found in {log_path}")
n = counts[-1]

readme = "README.md"
with open(readme) as f:
    text = f.read()
new = re.sub(r"(sbt test\s+# )\d+ tests:", rf"\g<1>{n} tests:", text)
if new == text and f"# {n} tests:" not in text:
    sys.exit("README.md test-count line not found or pattern changed")
with open(readme, "w") as f:
    f.write(new)
print(f"README.md test count -> {n}")
