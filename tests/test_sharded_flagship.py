"""run_flagship_sharded ≡ run_flagship: the concurrent table-sharded drivers
(the cluster-scaling unit — bench.py's scaling legs) must emit the identical
triple multiset as one driver over the whole corpus."""

import pyspark.sql.functions as F


class TestShardedFlagship:
    def test_sharded_equals_single(self, spark):
        from table_annotation_spark.flagship import (
            run_flagship,
            run_flagship_sharded,
        )

        sf = "/root/testdata/sf0.001"
        single = run_flagship(spark, sf).select("subj", "pred", "obj")
        sharded = run_flagship_sharded(spark, sf, shards=2).select("subj", "pred", "obj")
        a = sorted(map(tuple, single.collect()))
        b = sorted(map(tuple, sharded.collect()))
        assert len(a) == len(b) > 0
        assert a == b
