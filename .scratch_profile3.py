import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","32")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from gdelt_extractor_spark.functions.text import tokens
from gdelt_extractor_spark.operators.dedup import shingle_hashes_from_tokens
from __spark_entry__ import _docs

def t(label, fn):
    t0 = time.time(); r = fn(); print(f"{label}: {time.time()-t0:.2f}s -> {r}", flush=True)

docs = _docs(spark, "/root/testdata/sf0.1", width=0)
t("warm_scan", lambda: docs.count())
raw = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("_toks")).select(
    "id", shingle_hashes_from_tokens(F.col("_toks"), 3, distinct=False).alias("sh"))
ex = raw.select("id", F.explode("sh").alias("shingle"))
t("explode_collapsed", lambda: ex.count())
t("explode_collapsed2", lambda: ex.count())
spark.conf.set("spark.sql.optimizer.excludedRules",
               "org.apache.spark.sql.catalyst.optimizer.CollapseProject")
t("explode_nocollapse", lambda: ex.count())
t("explode_nocollapse2", lambda: ex.count())
spark.conf.unset("spark.sql.optimizer.excludedRules")
