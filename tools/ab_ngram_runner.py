"""Single-variant leg of the dedup_ngram_jaccard A/B (PLANS.md #19,
round-13 measurement): run the query N times in one session against
the package rooted at argv[1], print one JSON line with per-run wall
times and per-run unique-stage counts (statusTracker over a per-run
job group). The driving shell interleaves legs HEAD,r11,HEAD,r11 so
host drift lands evenly on both variants.

Usage: python tools/ab_ngram_runner.py <repo_root> <sf_dir> <n_runs>
"""

import json
import sys
import time

repo, sf_dir, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)

from twilio_event_streams_reporting_example_spark.registry import all_queries  # noqa: E402
from twilio_event_streams_reporting_example_spark.session import get_spark  # noqa: E402

try:
    from twilio_event_streams_reporting_example_spark.registry import release_caches
except ImportError:  # older tree without tracked-handle release
    def release_caches():
        pass

spark = get_spark("ab-ngram")
sc = spark.sparkContext


def _force(df):
    df.write.format("noop").mode("overwrite").save()


_force(spark.read.parquet(f"{sf_dir}/region.parquet"))  # JVM warmup

spec = all_queries()["dedup_ngram_jaccard"]
runs, stages = [], []
for k in range(n):
    group = f"ab{k}"
    sc.setJobGroup(group, "ngram A/B leg")
    t0 = time.perf_counter()
    _force(spec.fn(spark, sf_dir))
    runs.append(round(time.perf_counter() - t0, 3))
    st = sc.statusTracker()
    sids = set()
    for j in st.getJobIdsForGroup(group):
        info = st.getJobInfo(j)
        if info:
            sids.update(info.stageIds)
    stages.append(len(sids))
    release_caches()
    spark.catalog.clearCache()

spark.stop()
print(json.dumps({
    "repo": repo,
    "runs": runs,
    "warm_min": min(runs[1:]) if len(runs) > 1 else runs[0],
    "cold": runs[0],
    "stages": stages,
}))
