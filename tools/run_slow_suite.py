"""Run the slow-marked test suite and record per-test results + runtimes
as TESTS_r{N}.json (VERDICT r4 next #6: the round's strongest claims
must not live only in test files nobody provably runs).

Usage: python tools/run_slow_suite.py [round_number] [extra pytest args]
Writes /root/repo/TESTS_r{N}.json.  RAC2D_E2E_FULL=1 is exported so the
coupled e2e variant runs too (VERDICT r4 next #7).
"""

import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "05"
    extra = sys.argv[2:]
    xml_path = "/tmp/slow_suite.xml"
    env = dict(os.environ)
    env["RAC2D_E2E_FULL"] = "1"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "slow", "-q",
         "--junitxml", xml_path] + extra,
        cwd=ROOT, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    tests = []
    try:
        root = ET.parse(xml_path).getroot()
        for case in root.iter("testcase"):
            status = "passed"
            msg = None
            for tag in ("failure", "error"):
                el = case.find(tag)
                if el is not None:
                    status = tag
                    msg = (el.get("message") or "")[:300]
            if case.find("skipped") is not None:
                status = "skipped"
                msg = (case.find("skipped").get("message") or "")[:300]
            tests.append(dict(
                test=f"{case.get('classname')}::{case.get('name')}",
                status=status, time_s=round(float(case.get("time", 0)), 1),
                **({"message": msg} if msg else {})))
    except Exception as e:
        tests.append(dict(test="<junitxml parse failed>", status="error",
                          message=repr(e)))
    out = dict(
        round=rnd,
        cmd="pytest tests/ -m slow (RAC2D_E2E_FULL=1, forced-CPU "
            "8-virtual-device mesh via conftest)",
        rc=r.returncode, wall_s=round(wall, 1),
        n_passed=sum(t["status"] == "passed" for t in tests),
        n_failed=sum(t["status"] in ("failure", "error") for t in tests),
        n_skipped=sum(t["status"] == "skipped" for t in tests),
        tests=sorted(tests, key=lambda t: -t["time_s"]),
        tail=r.stdout.splitlines()[-3:])
    path = os.path.join(ROOT, f"TESTS_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "tests"}))
    print("wrote", path)


if __name__ == "__main__":
    main()
