#!/usr/bin/env python3
"""Stamp the round's full-suite result as TESTS_r<N>.json.

Reads an sbt test log (default: the newest /tmp/sbt_test*.log, or the path
given as argv[1]), extracts the final ScalaTest summary line, and writes
TESTS_r<N>.json (N from argv[2], default: highest CORRECTNESS_r*.json + 0)
so "the suite was green" is a committed, checkable artifact — the r8 round
shipped a red test precisely because no such record was required.
"""
import glob
import json
import os
import re
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

logs = sorted(glob.glob("/tmp/sbt_test*.log"), key=os.path.getmtime)
log = sys.argv[1] if len(sys.argv) > 1 else (logs[-1] if logs else None)
if not log or not os.path.exists(log):
    sys.exit("no sbt test log found (pass the path explicitly)")

text = open(log, errors="replace").read()
m = None
for m in re.finditer(
    r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+), pending (\d+)",
    text,
):
    pass
if m is None:
    sys.exit(f"no ScalaTest summary line in {log}")
succeeded, failed, canceled, ignored, pending = map(int, m.groups())
suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", text)
completed, aborted = map(int, suites[-1]) if suites else (-1, -1)

if len(sys.argv) > 2:
    rnd = int(sys.argv[2])
else:
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    rnd = max(rounds) + 1 if rounds else 1

# Freshness (r14 verdict item 3: the r14 stamp predated a later
# source-touching commit): a green log must postdate the last commit that
# touched src/ or tools/, or it certifies a tree that no longer exists.
# (Uncommitted working-tree edits are still the operator's responsibility —
# git can't date those; the commit workflow runs the suite before pushing.)
last_src_commit = int(
    subprocess.check_output(
        ["git", "-C", repo, "log", "-1", "--format=%ct", "--", "src", "tools"]
    ).strip() or b"0"
)
if int(os.path.getmtime(log)) < last_src_commit:
    sys.exit(
        f"stale test log: {log} (mtime {int(os.path.getmtime(log))}) predates "
        f"the last src/tools commit ({last_src_commit}) — re-run sbt test at HEAD"
    )

out = os.path.join(repo, f"TESTS_r{rnd:02d}.json")
stamp = {
    "suites_completed": completed,
    "suites_aborted": aborted,
    "tests_succeeded": succeeded,
    "tests_failed": failed,
    "tests_canceled": canceled,
    "tests_ignored": ignored,
    "green": failed == 0 and aborted == 0 and canceled == 0,
    "log": log,
    "log_mtime": int(os.path.getmtime(log)),
    "last_src_commit_time": last_src_commit,
}
json.dump(stamp, open(out, "w"), indent=1)
print(out, json.dumps(stamp))
sys.exit(0 if stamp["green"] else 1)
