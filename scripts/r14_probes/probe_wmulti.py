"""Where does w_multi_one_pass spend its 1.4 s? Interleaved arms in one
session: (a) the full 8-aggregate query, (b) rank-only (same exchange+
sort, one RowFrame processor), (c) sort-only (no Window at all),
(d) full query with sum/first/last forced to a ROWS frame (frame-
processor merge candidate — legal iff the order is a total order, which
the 7-column tiebreak is in every driver fixture)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .appName("wmulti-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet(f"{SF}/lineitem.parquet")
ORDER = ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
         "l_suppkey", "l_quantity", "l_extendedprice"]
w = Window.partitionBy("l_returnflag").orderBy(*ORDER)
wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

KEEP = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]


def full():
    return li.select(
        *KEEP,
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.row_number().over(w).cast("int").alias("rn"),
        F.sum("l_quantity").over(w).alias("run_qty"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w).alias("cur_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
    )


def full_rows():
    return li.select(
        *KEEP,
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.row_number().over(w).cast("int").alias("rn"),
        F.sum("l_quantity").over(wrows).alias("run_qty"),
        F.first("l_quantity").over(wrows).alias("first_qty"),
        F.last("l_quantity").over(wrows).alias("cur_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
    )


def rank_only():
    return li.select(*KEEP, F.rank().over(w).cast("int").alias("rnk"))


def sort_only():
    return li.repartition(32, "l_returnflag").sortWithinPartitions(
        "l_returnflag", *ORDER
    ).select(*KEEP)


def run(build):
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


arms = {"full": full, "full_rows": full_rows, "rank_only": rank_only,
        "sort_only": sort_only}
for name, b in arms.items():
    run(b)  # warm
res = {k: [] for k in arms}
for rep in range(5):
    for name, b in arms.items():
        res[name].append(round(run(b), 3))
import statistics as st
for name, times in res.items():
    print(f"{name:10s} median {st.median(times):.3f}  min {min(times):.3f}  {times}")
# equivalence check: full vs full_rows must be identical under the
# unique 7-column order
diff = full().exceptAll(full_rows()).count() + full_rows().exceptAll(full()).count()
print("full vs full_rows exceptAll both ways:", diff)
spark.stop()
