"""Batch-size sweep for the heavy ladder rungs (round-5 item 1).

Prints one line per (rung, batch): aggregate env-steps/s, best-of-3
windows.  Usage: python docs/perf_bsweep.py [humanoid|quadruped|jaco]
"""

import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "humanoid"
    batches = [int(b) for b in (sys.argv[2:] or [1024, 2048, 4096, 8192])]
    for b in batches:
        n = max(8, 32768 // b)
        if which == "humanoid":
            sps, _ = bench.bench_env("humanoid", "run", b, n)
        elif which == "quadruped":
            sps, _ = bench.bench_env("quadruped", "walk", b, n)
        elif which == "jaco":
            sps, _ = bench.bench_manipulation("reach_site_features", b, n)
        else:
            raise SystemExit(f"unknown rung {which}")
        print(f"BSWEEP {which} B={b} n={n} env_steps_per_s={sps:.0f}",
              flush=True)


if __name__ == "__main__":
    main()
