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
t("textlen", lambda: docs.select(F.sum(F.length("text"))).first()[0])
t("ntokens", lambda: docs.select(F.sum(F.size(tokens("text")))).first()[0])
t("ntokens2", lambda: docs.select(F.sum(F.size(tokens("text")))).first()[0])
# raw shingle arrays (two-select, as _shingle_rows does)
raw = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("_toks")).select(
    "id", shingle_hashes_from_tokens(F.col("_toks"), 3, distinct=False).alias("sh"))
t("raw_arrays", lambda: raw.select(F.sum(F.size("sh"))).first()[0])
t("raw_arrays2", lambda: raw.select(F.sum(F.size("sh"))).first()[0])
ex = raw.select("id", F.explode("sh").alias("shingle"))
t("explode", lambda: ex.count())
t("distinct", lambda: ex.distinct().count())
