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
        ok = p.returncode == 0
        skipped = not ok and "no tests ran" in p.stdout
        results[node] = "PASS" if ok else ("SKIP" if skipped else "FAIL")
        print(f"{results[node]:4s} {node} ({time.time() - t0:.0f}s)", flush=True)
        if results[node] == "FAIL":
            tail = (p.stdout or "").strip().splitlines()[-12:]
            for line in tail:
                print("   |", line)

    fails = [n for n, r in results.items() if r == "FAIL"]
    import json

    print(f"\ntpu lane: {len(results) - len(fails)}/{len(results)} passed")
    print(json.dumps({"metric": "tpu_gold_lane", "passed":
                      len(results) - len(fails), "total": len(results),
                      "failed": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
