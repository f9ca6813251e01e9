import sys, time
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","32")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
q = E.queries()["dedup_ngram_jaccard"]
for i in range(3):
    t0 = time.time()
    n = q(spark, "/root/testdata/sf0.1").count()
    print(f"run{i}: {time.time()-t0:.2f}s rows={n}", flush=True)
