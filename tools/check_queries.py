"""Dev helper: run the oracle compare for specific queries.

Usage: python tools/check_queries.py [sf_dir] name [name ...]
       python tools/check_queries.py --all [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from twilio_event_streams_reporting_example_spark.session import get_spark
from twilio_event_streams_reporting_example_spark.registry import all_queries

from oracle_harness import compare  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    run_all = "--all" in args
    args = [a for a in args if a != "--all"]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = list(all_queries()) if run_all else args
    spark = get_spark("check")
    failed = []
    for name in names:
        t0 = time.time()
        try:
            compare(spark, name, sf_dir)
            print(f"OK   {name}  ({time.time() - t0:.1f}s)")
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:500]}")
    if failed:
        sys.exit(f"{len(failed)} failed: {failed}")
    print(f"all {len(names)} green at {sf_dir}")


if __name__ == "__main__":
    main()
