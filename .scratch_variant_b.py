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
import __spark_entry__ as E
from __spark_entry__ import _docs

def variant_b(df, text_col, id_col, n=3, threshold=0.6, max_shingle_df=100):
    rows = _shingle_rows(df, text_col, id_col, n).persist()
    sizes = rows.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    hot = (rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
           .filter(F.col("n_docs") > max_shingle_df).select("shingle"))
    cold = rows.join(hot, "shingle", "left_anti")
    hot_arr = (rows.join(hot, "shingle").groupBy("id")
               .agg(F.collect_list("shingle").alias("hot_sh")))
    a = cold.select(F.col("id").alias("id_a"), "shingle")
    b = cold.select(F.col("id").alias("id_b"), "shingle")
    inter = (a.join(b, (a["shingle"] == b["shingle"]) & (F.col("id_a") < F.col("id_b")))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    ha = hot_arr.select(F.col("id").alias("id_a"), F.col("hot_sh").alias("hot_a"))
    hb = hot_arr.select(F.col("id").alias("id_b"), F.col("hot_sh").alias("hot_b"))
    inter = (inter.join(sa, "id_a").join(sb, "id_b")
             .join(ha, "id_a", "left").join(hb, "id_b", "left")
             .withColumn("n_common", F.col("n_common") + F.when(
                 F.col("hot_a").isNotNull() & F.col("hot_b").isNotNull(),
                 F.size(F.array_intersect("hot_a", "hot_b"))).otherwise(F.lit(0))))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    out = (inter.withColumn("jaccard", F.round(jac, 6))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard")
           .localCheckpoint(eager=True))
    rows.unpersist()
    return out

for i in range(3):
    t0 = time.time()
    docs = _docs(spark, "/root/testdata/sf0.1", width=0)
    nrows = variant_b(docs, "text", "doc_id").count()
    print(f"run{i}: {time.time()-t0:.2f}s rows={nrows}", flush=True)
