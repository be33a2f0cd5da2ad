"""Z-order compaction: multi-column data skipping.

The assertion is physical, not hoped-for: parquet footer min/max of BOTH
z-ordered columns must cover small slices of their domains per file,
where lexicographic range clustering leaves the trailing column's per-file
range at ~the full domain.
"""

import glob
import os

import pyarrow.parquet as pq

from bulker_spark.sinks.warehouse import Warehouse


def _file_ranges(vdir: str, col: str) -> list[tuple[float, float]]:
    out = []
    for p in glob.glob(os.path.join(vdir, "part-*.parquet")):
        md = pq.ParquetFile(p).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((float(lo), float(hi)))
    return out


def _avg_coverage(ranges, domain: float) -> float:
    return sum((hi - lo) for lo, hi in ranges) / (len(ranges) * domain)


def _make_table(spark, wh, name, method):
    # two INDEPENDENT uniform columns — the adversarial case for
    # lexicographic clustering
    df = (
        spark.range(40_000)
        .selectExpr(
            "id",
            "CAST(pmod(hash(id), 10000) AS DOUBLE) AS x",
            "CAST(pmod(hash(id + 77), 10000) AS DOUBLE) AS y",
        )
    )
    wh.create_or_replace(name, df)
    kw = {method: ["x", "y"]}
    wh.compact(name, target_file_bytes=32 * 1024, **kw)
    meta = wh.get_meta(name)
    return os.path.join(wh._table_dir(name), meta.version)


def test_zorder_prunes_both_columns(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    vdir = _make_table(spark, wh, "tz", "zorder_by")
    xr = _file_ranges(vdir, "x")
    yr = _file_ranges(vdir, "y")
    assert len(xr) >= 12, "compaction should produce ~16 files"
    # both dimensions cluster: with ~16 z-slices the curve splits each
    # domain ~4 ways, so per-file coverage sits near 1/4 — not the ~1.0 an
    # unclustered (or trailing-key) layout shows
    assert _avg_coverage(xr, 10000.0) < 0.45
    assert _avg_coverage(yr, 10000.0) < 0.45
    # row counts preserved
    assert wh.read("tz").count() == 40_000


def test_zorder_beats_lexicographic_on_trailing_column(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    zdir = _make_table(spark, wh, "tz2", "zorder_by")
    cdir = _make_table(spark, wh, "tc2", "cluster_by")
    z_y = _avg_coverage(_file_ranges(zdir, "y"), 10000.0)
    c_y = _avg_coverage(_file_ranges(cdir, "y"), 10000.0)
    # lexicographic: y per-file range ~ full domain; z-order: a fraction
    assert c_y > 0.8, f"lexicographic trailing coverage unexpectedly low: {c_y}"
    assert z_y < c_y / 2, (z_y, c_y)
