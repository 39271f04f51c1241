"""Z-order clustering layout: per-file parquet min/max stats must box
BOTH dimensions tightly, unlike a hash-random layout (which gives every
file the full range of every column). Measured, not asserted from
theory: mean normalized per-file span over both dims."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions.layout import write_zordered
from ai_ready_data_framework_spark.io import load_table

N_FILES = 8


def _mean_spans(path: str, col_a: str, col_b: str) -> tuple[float, float, int]:
    """Mean per-file (max-min) span for two columns, normalized by the
    global span, read straight from parquet row-group statistics."""
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    mins_a, maxs_a, mins_b, maxs_b = [], [], [], []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        fa_min = fa_max = fb_min = fb_max = None
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(idx[col_a]).statistics
            sb = md.row_group(rg).column(idx[col_b]).statistics
            fa_min = sa.min if fa_min is None else min(fa_min, sa.min)
            fa_max = sa.max if fa_max is None else max(fa_max, sa.max)
            fb_min = sb.min if fb_min is None else min(fb_min, sb.min)
            fb_max = sb.max if fb_max is None else max(fb_max, sb.max)
        mins_a.append(fa_min), maxs_a.append(fa_max)
        mins_b.append(fb_min), maxs_b.append(fb_max)
    ga, gb = max(maxs_a) - min(mins_a), max(maxs_b) - min(mins_b)
    span_a = sum(x - n for x, n in zip(maxs_a, mins_a)) / len(files) / ga
    span_b = sum(x - n for x, n in zip(maxs_b, mins_b)) / len(files) / gb
    return span_a, span_b, len(files)


def test_zorder_layout_boxes_both_dimensions(spark, sf_correctness, tmp_path):
    orders = load_table(spark, sf_correctness, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
        "o_totalprice",
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "rand")
    write_zordered(orders, zpath, "o_custkey", "order_us", n_files=N_FILES)
    orders.repartition(N_FILES).write.mode("overwrite").parquet(rpath)

    za, zb, zn = _mean_spans(zpath, "o_custkey", "order_us")
    ra, rb, rn = _mean_spans(rpath, "o_custkey", "order_us")
    # rn is exact (hash repartition); zn tolerates one empty range
    # partition — boundaries come from sampling, and the tie-broken
    # range key makes emptiness rare but not impossible on tiny inputs
    assert rn == N_FILES and N_FILES - 1 <= zn <= N_FILES
    # hash layout: every file spans ~the full range of both columns
    assert ra > 0.95 and rb > 0.95, (ra, rb)
    # z-order: each file boxes BOTH dims well below the full range.
    # Threshold carries a measured margin: repartitionByRange picks
    # boundaries by SAMPLING with an RDD-id-derived seed, so per-file
    # spans drift run to run — observed za up to 0.609 on an identical
    # tree (VERIFY_r13), typical ~0.55/0.38. 0.65 keeps a wide gap to
    # the hash layout's >0.95 while absorbing the sampler's scatter.
    assert za < 0.65 and zb < 0.65, (za, zb)
    # and no rows were lost by the rewrite
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(rpath).count()
        == orders.count()
    )


def test_zorder_layout_prunes_box_queries(spark, sf_correctness, tmp_path):
    """End-to-end skipping proof: a box predicate on (custkey, date)
    over the z-ordered layout must read fewer files than the hash
    layout — counted via per-file stats overlap, the same decision
    parquet predicate pushdown makes."""
    orders = load_table(spark, sf_correctness, "orders").select(
        "o_custkey", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us")
    )
    zpath, rpath = str(tmp_path / "z2"), str(tmp_path / "rand2")
    write_zordered(orders, zpath, "o_custkey", "order_us", n_files=N_FILES)
    orders.repartition(N_FILES).write.mode("overwrite").parquet(rpath)

    lo_c, hi_c, lo_u, hi_u = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("order_us"), F.max("order_us")
    ).first()
    # a ~quarter box in each dimension
    box_c = (lo_c, lo_c + (hi_c - lo_c) // 4)
    box_u = (lo_u, lo_u + (hi_u - lo_u) // 4)

    def files_matching(path: str) -> int:
        n = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            hit = False
            for rg in range(md.num_row_groups):
                sc = md.row_group(rg).column(idx["o_custkey"]).statistics
                su = md.row_group(rg).column(idx["order_us"]).statistics
                if (
                    sc.min <= box_c[1]
                    and sc.max >= box_c[0]
                    and su.min <= box_u[1]
                    and su.max >= box_u[0]
                ):
                    hit = True
            n += hit
        return n

    z_hits, r_hits = files_matching(zpath), files_matching(rpath)
    assert r_hits == N_FILES  # random layout: every file might match
    assert z_hits < N_FILES // 2, (z_hits, r_hits)  # z-order: most skip
