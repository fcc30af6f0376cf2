"""End-to-end proof of the layout claims: a Z-order-written dataset's
parquet footers carry tight per-file min/max on BOTH dimensions, so a
2-D range predicate can skip most files — where a row-order layout
skips none on the second dimension.  Verified from the actual file
statistics via pyarrow, not from plan text.  Plus the small-file
compaction round trip."""

import glob
import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import layout as ly
from datafusion_monoid_spark.sources.io import compact_parquet


def _file_ranges(path: str, cols: tuple[str, str]):
    """[(path, {col: (min, max)})] from parquet footer statistics."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        if any(v is None for v in lo.values()):
            continue
        out.append((f, {c: (lo[c], hi[c]) for c in cols}))
    return out


def test_zorder_files_prune_2d_predicates(spark, tmp_path):
    n_side, n_files = 64, 16
    pts = [(i, i % n_side, i // n_side) for i in range(n_side * n_side)]
    df = spark.createDataFrame(pts, "i long, x long, y long")

    zdir, rdir = str(tmp_path / "zorder"), str(tmp_path / "roworder")
    ly.zorder_repartition(df, F.col("x"), F.col("y"), n_files) \
        .write.mode("overwrite").parquet(zdir)
    df.repartitionByRange(n_files, "i").write.mode("overwrite").parquet(rdir)

    def would_scan(ranges, x_lo, x_hi, y_lo, y_hi):
        return sum(
            1 for _, r in ranges
            if not (r["x"][1] < x_lo or r["x"][0] > x_hi
                    or r["y"][1] < y_lo or r["y"][0] > y_hi))

    zr = _file_ranges(zdir, ("x", "y"))
    rr = _file_ranges(rdir, ("x", "y"))
    assert len(zr) == n_files and len(rr) == n_files

    # row-major id order IS y-sorted, so it prunes y — the point of
    # z-order is pruning on EITHER dimension from one layout:
    # x-only predicate: every row-order file spans the full x range
    assert would_scan(rr, 8, 23, 0, 63) == n_files
    assert would_scan(zr, 8, 23, 0, 63) <= n_files // 2
    # y-only predicate: both layouts prune
    assert would_scan(rr, 0, 63, 8, 23) <= n_files // 2
    assert would_scan(zr, 0, 63, 8, 23) <= n_files // 2
    # 2-D tile: z-order at least as tight as the y-sorted baseline
    assert would_scan(zr, 8, 23, 8, 23) <= would_scan(rr, 8, 23, 8, 23)
    assert would_scan(zr, 8, 23, 8, 23) <= n_files // 4

    # correctness: both layouts return identical rows for the predicate
    q = lambda d: {r.i for r in
                   spark.read.parquet(d)
                   .where((F.col("x").between(8, 23))
                          & (F.col("y").between(8, 23))).collect()}
    assert q(zdir) == q(rdir)


def test_compact_parquet_round_trip(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    spark.range(10_000).repartition(40).write.parquet(src)
    n_before = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_before == 40
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    n_after = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert n == 1 and n_after == 1
    # same data, byte-for-byte row set
    assert (spark.read.parquet(dst).agg(F.sum("id"), F.count("*")).first()
            == spark.read.parquet(src).agg(F.sum("id"), F.count("*")).first())
