import os, sys, time, statistics, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from receiptanalyzerpipeline_spark.plans import REGISTRY
from receiptanalyzerpipeline_spark.session import get_spark

spark = get_spark(app_name="er2-ab2")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
df = REGISTRY["q_er2_qgram_edit_join"].spark(spark, sf_dir)
for _ in range(3):
    df.toArrow()  # deep warm
settings = [10000, 65536, 262144]
runs = {s: [] for s in settings}
ranks = {s: [] for s in settings}
for rnd in range(12):
    order = settings[rnd % 3:] + settings[:rnd % 3]  # rotate order
    rt = {}
    for s in order:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(s))
        t0 = time.perf_counter()
        df.toArrow()
        rt[s] = time.perf_counter() - t0
    for i, (s, t) in enumerate(sorted(rt.items(), key=lambda kv: kv[1])):
        ranks[s].append(i)
    for s, t in rt.items():
        runs[s].append(t)
out = {str(s): {"min": round(min(v),4), "median": round(statistics.median(v),4),
                "mean_rank": round(sum(ranks[s])/len(ranks[s]),2)}
       for s, v in runs.items()}
print(json.dumps(out, indent=1))
