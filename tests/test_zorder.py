"""Z-order (Morton) clustering: the locality property and the row-group
pruning payoff it exists for.

Two claims, both measured rather than asserted by authority:

1. Sorting by the Morton code makes consecutive blocks tight boxes in
   BOTH dimensions — total per-block bounding-box area shrinks by an
   order of magnitude vs the insertion (single-key) order.
2. A parquet layout written z-ordered lets a 2-D range predicate skip
   most row groups via footer min/max stats, while the single-key sort
   leaves one dimension unclustered and must touch nearly everything.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wiki_references_db_spark.operators.zorder import (
    morton_interleave8,
    write_zordered,
    zorder_bucket,
)
from wiki_references_db_spark.tables import load_table

BLOCK = 64


def _bucketed_orders(spark):
    o = load_table(spark, SF_DIR, "orders")
    day = (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long")
    bounds = o.agg(
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.min(day).alias("dlo"),
        F.max(day).alias("dhi"),
    ).first()
    x = zorder_bucket(F.col("o_custkey"), F.lit(bounds.clo), F.lit(bounds.chi))
    y = zorder_bucket(day, F.lit(bounds.dlo), F.lit(bounds.dhi))
    return o, x, y, bounds


def _total_block_bbox_area(pdf):
    area = 0
    for start in range(0, len(pdf), BLOCK):
        blk = pdf.iloc[start : start + BLOCK]
        area += (blk.x.max() - blk.x.min() + 1) * (blk.y.max() - blk.y.min() + 1)
    return area


def test_morton_sort_shrinks_block_bounding_boxes(spark):
    o, x, y, _ = _bucketed_orders(spark)
    coded = o.select(
        x.alias("x"), y.alias("y"), morton_interleave8(x, y).alias("z"), "o_orderkey"
    )
    linear = coded.orderBy("o_orderkey").select("x", "y").toPandas()
    zsorted = coded.orderBy("z").select("x", "y").toPandas()
    a_lin = _total_block_bbox_area(linear)
    a_z = _total_block_bbox_area(zsorted)
    # Insertion order scatters both dimensions (~full 256x256 box per
    # block); z-order must cut total box area by at least 5x.
    assert a_z * 5 < a_lin, (a_z, a_lin)


def test_zordered_parquet_prunes_2d_range_predicates(spark, tmp_path):
    o, x, y, bounds = _bucketed_orders(spark)
    n = o.count()
    per_file = max(n // 16, 1)

    zpath = os.path.join(str(tmp_path), "zorder")
    lpath = os.path.join(str(tmp_path), "linear")
    write_zordered(o, zpath, x, y, max_records_per_file=per_file)
    (
        o.repartitionByRange(4, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(lpath)
    )

    # Query box: the middle quarter of each dimension.
    cspan = bounds.chi - bounds.clo
    dspan = bounds.dhi - bounds.dlo
    c_lo, c_hi = bounds.clo + 3 * cspan // 8, bounds.clo + 5 * cspan // 8
    d_lo, d_hi = bounds.dlo + 3 * dspan // 8, bounds.dlo + 5 * dspan // 8

    def overlap_fraction(path):
        touched = total = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            ci = schema_names.index("o_custkey")
            di = schema_names.index("o_orderdate")
            for rg in range(meta.num_row_groups):
                total += 1
                cst = meta.row_group(rg).column(ci).statistics
                dst = meta.row_group(rg).column(di).statistics
                d_min = dst.min.timestamp() // 86400
                d_max = dst.max.timestamp() // 86400
                if cst.max >= c_lo and cst.min <= c_hi and d_max >= d_lo and d_min <= d_hi:
                    touched += 1
        assert total >= 8, f"layout produced too few row groups ({total})"
        return touched / total

    frac_z = overlap_fraction(zpath)
    frac_l = overlap_fraction(lpath)
    # The single-key sort clusters o_orderkey only: custkey/date stats
    # straddle the whole domain, so (almost) every row group overlaps
    # the box.  Z-order must skip at least half while linear skips
    # (nearly) nothing.
    assert frac_z <= 0.5, frac_z
    assert frac_z < frac_l, (frac_z, frac_l)

    # And the data is intact: same row count, same key checksum.
    z_df = spark.read.parquet(zpath)
    assert z_df.count() == n
    orig_sum = o.agg(F.sum("o_orderkey")).first()[0]
    assert z_df.agg(F.sum("o_orderkey")).first()[0] == orig_sum


@pytest.mark.parametrize("x,y,expected", [(0, 0, 0), (1, 0, 2), (0, 1, 1), (255, 255, 65535)])
def test_morton_interleave_known_codes(spark, x, y, expected):
    row = spark.range(1).select(
        morton_interleave8(F.lit(x), F.lit(y)).alias("z")
    ).first()
    assert row.z == expected
