"""Planar spatial analytics — the grid lane end-to-end (no reference
analog; Phase-5 extension; see operators/spatial.py):

1. plant deterministic binary-rational coordinates on suppliers and
   customers (the synthetic corpus has no geo columns),
2. radius join: every supplier–customer pair within distance 1 as a
   3×3 grid-cell EQUI-join — never a cross join,
3. kNN join: each supplier's 3 nearest customers within radius 2
   (grid candidates + one rank window),
4. grid-density clusters: core cells merged through the wcc star
   contraction on the CELL graph, noise labeled NULL,
5. Gi* hot spots: the z-surface that says WHERE the density is
   anomalous, not just high,
6. a plan audit proving the shapes scale (no cartesian legs).

Run: python examples/spatial_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.spatial import (grid_density_clusters,
                                                   hotspot_gi, knn_join,
                                                   radius_join)
from hazelcast_jet_spark.plans import assert_plan

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-spatial-analytics")

GRID = 0.0625  # 1/16: every coordinate an exact binary rational
suppliers = load_table(spark, sf_dir, "supplier").select(
    "s_suppkey", "s_nationkey",
    ((F.col("s_suppkey") % 512) * GRID).alias("x"),
    (((F.col("s_suppkey") * 11) % 512) * GRID).alias("y"))
customers = load_table(spark, sf_dir, "customer").select(
    "c_custkey",
    ((F.col("c_custkey") % 512) * GRID).alias("x"),
    (((F.col("c_custkey") * 7) % 512) * GRID).alias("y"))

# -- 2. radius join ---------------------------------------------------------
pairs = radius_join(suppliers, customers, radius=1.0)
print(f"pairs within radius 1.0: {pairs.count()}")

# -- 3. kNN join ------------------------------------------------------------
knn = knn_join(suppliers, customers, k=3, radius=2.0,
               left_id="s_suppkey", right_id="c_custkey")
print("nearest customers of supplier 1:")
knn.filter(F.col("s_suppkey_l") == 1).orderBy("rank").show()

# -- 4. density clusters ----------------------------------------------------
clustered = grid_density_clusters(customers, cell=1.0, min_pts=3)
summary = (clustered.groupBy(F.coalesce("cluster", F.lit(-1))
                             .alias("cluster"))
           .agg(F.count(F.lit(1)).alias("n_points"))
           .orderBy(F.col("n_points").desc()))
print("largest clusters (-1 = noise):")
summary.show(5)

# -- 5. hot spots -----------------------------------------------------------
hot = hotspot_gi(customers, cell=1.0)
print("hottest cells by Gi* z:")
hot.orderBy(F.col("z").desc_nulls_last(), "cx", "cy").show(5)

# -- 6. the scale proof -----------------------------------------------------
for name, df in (("radius", pairs), ("knn", knn)):
    audit = assert_plan(df)  # raises on cartesian/BNLJ legs
    print(f"{name}: scans={audit['scans']} exchanges={audit['exchanges']} "
          f"cartesian={audit['cartesian']}")
print("spatial analytics example complete")
