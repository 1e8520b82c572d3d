"""Real-device (TPU) gold-lane driver.

Runs every `tpu`-marked test in its OWN pytest process: the axon remote-TPU
backend can poison a process after one failed compile (SIGABRT'd compile
helper, UNIMPLEMENTED eager op, ...), so in-process batching would turn one
backend hiccup into a cascade of bogus failures — the same reason bench.py
isolates its children.

    python -m tests.tpu_lane            # full lane (~10 decks)
    python -m tests.tpu_lane -k lbm     # subset

Exit code 0 iff every test passed.  Cold axon compiles cost minutes per
deck; warm (terminal compile cache) the lane finishes in a few minutes.
"""

import os
import subprocess
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, MARLIN_TPU_TESTS="1")
    collect = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "tpu",
         "--collect-only", "-q", *argv],
        capture_output=True, text=True, cwd=root, env=env,
    )
    nodes = [l.strip() for l in collect.stdout.splitlines()
             if "::" in l and not l.startswith("=")]
    if not nodes:
        print("no tpu-marked tests collected", file=sys.stderr)
        print(collect.stdout[-2000:], file=sys.stderr)
        return 2

    results = {}
    for node in nodes:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "pytest", node, "-q", "-x"],
            capture_output=True, text=True, cwd=root, env=env,
        )
        # pytest exits 0 for "1 skipped" — a skip (e.g. a gold that does not
        # exist) must NOT count as PASS (r03 review: two solver CSV cases
        # silently skipped for three rounds while the lane reported
        # all-green).  Parse the summary line for an explicit skip count.
        summary = ""
        for line in reversed((p.stdout or "").strip().splitlines()):
            if ("passed" in line or "skipped" in line or "failed" in line
                    or "no tests ran" in line):
                summary = line
                break
        if p.returncode == 0 and "skipped" not in summary:
            results[node] = "PASS"
        elif "skipped" in summary or "no tests ran" in summary:
            results[node] = "SKIP"
        else:
            results[node] = "FAIL"
        print(f"{results[node]:4s} {node} ({time.time() - t0:.0f}s)", flush=True)
        if results[node] == "FAIL":
            tail = (p.stdout or "").strip().splitlines()[-12:]
            for line in tail:
                print("   |", line)
        elif results[node] == "SKIP":
            print("   |", summary.strip())

    fails = [n for n, r in results.items() if r == "FAIL"]
    skips = [n for n, r in results.items() if r == "SKIP"]
    passed = len(results) - len(fails) - len(skips)
    import json

    print(f"\ntpu lane: {passed}/{len(results)} passed, "
          f"{len(skips)} skipped, {len(fails)} failed")
    print(json.dumps({"metric": "tpu_gold_lane", "passed": passed,
                      "total": len(results), "skipped": skips,
                      "failed": fails}))
    # skips are an error too: every lane case must actually execute on the
    # device (exit 1 on FAIL, 3 on silent SKIP so CI can tell them apart)
    return 1 if fails else (3 if skips else 0)


if __name__ == "__main__":
    sys.exit(main())
