import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","32")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from gdelt_extractor_spark.operators.dedup import _shingle_rows
from __spark_entry__ import _docs

def t(label, fn):
    t0 = time.time(); r = fn(); print(f"{label}: {time.time()-t0:.2f}s -> {r}", flush=True)

docs = _docs(spark, "/root/testdata/sf0.1", width=0)
# warm the scan
t("scan_count", lambda: docs.count())
t("scan_count2", lambda: docs.count())
rows = _shingle_rows(docs, "text", "doc_id", 3)
t("shingle_rows", lambda: rows.count())
rows = rows.persist()
t("shingle_rows_persist", lambda: rows.count())
hot = (rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
       .filter(F.col("n_docs") > 100).select("shingle"))
t("hot", lambda: hot.count())
cold = rows.join(hot, "shingle", "left_anti")
t("cold", lambda: cold.count())
a = cold.select(F.col("id").alias("id_a"), "shingle")
b = cold.select(F.col("id").alias("id_b"), "shingle")
inter = (a.join(b, (a["shingle"] == b["shingle"]) & (F.col("id_a") < F.col("id_b")))
         .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common")))
t("selfjoin_agg", lambda: inter.count())
t("selfjoin_agg2", lambda: inter.count())
sizes = rows.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
full = (inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("n_common")/(F.col("size_a")+F.col("size_b")-F.col("n_common")),6))
        .filter(F.col("jaccard")>=0.6).select("id_a","id_b","jaccard"))
t("full", lambda: full.count())
t("full2", lambda: full.count())
