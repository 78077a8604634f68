"""Dump a cProfile stats file sorted by cumulative time
(reference: dm_control/scripts/print_profile.py:1-4).

    python -m dm_control_tpu.scripts.print_profile profile.out
"""

import pstats
import sys

if __name__ == "__main__":
    stats = pstats.Stats(sys.argv[1] if len(sys.argv) > 1 else "profile")
    stats.sort_stats("cumulative").print_stats(50)
