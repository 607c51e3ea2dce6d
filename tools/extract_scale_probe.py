"""A/B probe: extraction-stage throughput at a given core count, min of R
repeats (steal-resistant). Usage: python tools/extract_scale_probe.py CORES [CONVS] [REPEATS]"""
import sys
import time

sys.path.insert(0, "/root/repo")
from tera_spark.fixtures.transcripts import transcripts_spark_df
from tera_spark.pipeline.extract import extract_mentions
from tera_spark.session import get_spark

cores = int(sys.argv[1])
convs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
spark = get_spark("xp", cores=cores, shuffle_partitions=cores)
t = transcripts_spark_df(spark, n_convs=convs).cache()
n = t.count()
best = 1e9
for _ in range(reps):
    t0 = time.time()
    extract_mentions(t).write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
print(f"cores={cores} turns={n} best={best:.1f}s rate={n/best:.0f}/s", flush=True)
