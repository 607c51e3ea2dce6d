import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from tera_spark.session import get_spark
from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df
from tera_spark.pipeline.run import run_pipeline
cores = int(sys.argv[1]); aqe = sys.argv[2]
spark = get_spark("aqe", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.sql.adaptive.enabled": aqe})
t = transcripts_spark_df(spark, n_convs=20000).cache(); n = t.count()
lex = lexicon_spark_df(spark)
def once():
    out = tempfile.mkdtemp(prefix="kg_aqe_")
    t0=time.time(); run_pipeline(spark, t, lex, out); s=time.time()-t0
    shutil.rmtree(out, ignore_errors=True); return s
s = min(once(), once())
print(json.dumps({"cores": cores, "aqe": aqe, "turns": n, "seconds": round(s,2), "turns_per_sec": round(n/s,1)}), flush=True)
spark.stop()
