"""Interactive smoke: full pipeline over fixtures. Run: python scripts/smoke_annotation.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from table_annotation_spark import fixtures
from table_annotation_spark.plans.pipeline import PipelineRun
from table_annotation_spark.session import get_spark
from table_annotation_spark.sources import kg_build

t0 = time.time()
spark = get_spark(app_name="smoke", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

lbl_rows, edge_rows = fixtures.mini_kg()
labels = kg_build.labels_df(spark, lbl_rows).cache()
edges = kg_build.edges_df(spark, edge_rows).cache()
degrees = kg_build.degrees(edges).cache()
src = spark.createDataFrame(fixtures.source_rows())

run = PipelineRun(spark=spark, labels=labels, edges=edges, degrees=degrees)
out = run.run(src)

print("== timing ==", run.metrics, f"wall={time.time()-t0:.1f}s")

movie_tid = fixtures.table_id_of("acme/movies", "data/films.csv", "a" * 40)
city_tid = fixtures.table_id_of("acme/geo", "data/capitals.csv", "b" * 40)

print("== CEA (movie) ==")
out["cea"].where(f"table_id = '{movie_tid}'").orderBy("row_idx", "col_idx", "rank").show(60, False)
print("== CTA (movie) ==")
out["cta"].where(f"table_id = '{movie_tid}'").orderBy("col_idx", "rank").show(30, False)
print("== CPA (movie) ==")
out["cpa"].where(f"table_id = '{movie_tid}'").orderBy("head_col", "tail_col", "rank").show(30, False)
print("== CEA (city) ==")
out["cea"].where(f"table_id = '{city_tid}'").orderBy("row_idx", "col_idx").show(30, False)
print("== CPA (city) ==")
out["cpa"].where(f"table_id = '{city_tid}'").orderBy("head_col", "tail_col", "rank").show(30, False)
print("== triples ==")
out["triples"].select("subj", "pred", "obj", "obj_kind", "row_idx").orderBy("subj", "pred", "obj").show(100, False)
print(f"total wall: {time.time()-t0:.1f}s")
