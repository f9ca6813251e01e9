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
from __spark_entry__ import _docs

def t(label, fn):
    t0 = time.time(); r = fn(); print(f"{label}: {time.time()-t0:.2f}s -> {r}", flush=True)

docs = _docs(spark, "/root/testdata/sf0.1", width=0)
t("warm_scan", lambda: docs.count())
toks = F.col("_toks")
idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))

# A: current (slice + concat_ws + xxhash64 over string)
gramsA = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, (i + 1).cast("int"), 3))))
exA = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("_toks")).select("id", F.explode(gramsA).alias("s"))
t("A_slice_concat", lambda: exA.count())
t("A_slice_concat2", lambda: exA.count())

# B: element_at x3, multi-arg xxhash64 (no slice/concat)
gramsB = F.transform(idx, lambda i: F.xxhash64(F.element_at(toks, (i + 1).cast("int")),
                                               F.element_at(toks, (i + 2).cast("int")),
                                               F.element_at(toks, (i + 3).cast("int"))))
exB = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("_toks")).select("id", F.explode(gramsB).alias("s"))
t("B_element_at", lambda: exB.count())
t("B_element_at2", lambda: exB.count())

# C: pre-hash tokens, integer mix in lambda (token hashes materialized as column)
th = F.col("_th")
gramsC = F.transform(F.sequence(F.lit(0), F.greatest(F.size(th) - 3, F.lit(0))),
                     lambda i: F.xxhash64(F.element_at(th, (i + 1).cast("int")),
                                          F.element_at(th, (i + 2).cast("int")),
                                          F.element_at(th, (i + 3).cast("int"))))
exC = (docs.select(F.col("doc_id").alias("id"), tokens("text").alias("_toks"))
       .select("id", F.transform(F.col("_toks"), lambda x: F.xxhash64(x)).alias("_th"))
       .select("id", F.explode(gramsC).alias("s")))
t("C_prehash_mix", lambda: exC.count())
t("C_prehash_mix2", lambda: exC.count())
