#!/usr/bin/env python3
"""Capture the scalatest summary of an `sbt test` log into a JSON
sidecar (TESTS_r{N}.json), so per-round test counts are machine-read
instead of hand-copied (they drifted in rounds 10-11: 462/45 claimed
vs 461/42 measured).

Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
       python3 tools/test_summary.py /tmp/sbt_test.log TESTS_r12.json
"""
import json
import re
import sys


def main(log_path: str, out_path: str) -> int:
    text = open(log_path, errors="replace").read()
    # scalatest: "Tests: succeeded N, failed N, canceled N, ignored N, pending N"
    tests = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", text)
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", text)
    total = re.findall(r"Total number of tests run: (\d+)", text)
    # sbt: "Passed: Total N, Failed N, Errors N, Passed N"
    sbt_total = re.findall(
        r"Passed: Total (\d+), Failed (\d+), Errors (\d+), Passed (\d+)", text)
    if not tests or not suites:
        print("no scalatest summary found in", log_path, file=sys.stderr)
        return 1
    t, s = tests[-1], suites[-1]
    out = {
        "tests_run": int(total[-1]) if total else None,
        "succeeded": int(t[0]),
        "failed": int(t[1]),
        "canceled": int(t[2]),
        "ignored": int(t[3]),
        "pending": int(t[4]),
        "suites_completed": int(s[0]),
        "suites_aborted": int(s[1]),
    }
    if sbt_total:
        st = sbt_total[-1]
        out["sbt_total"] = int(st[0])
        out["sbt_failed"] = int(st[1])
        out["sbt_errors"] = int(st[2])
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps(out))
    return 0 if out["failed"] == 0 and out["suites_aborted"] == 0 else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
