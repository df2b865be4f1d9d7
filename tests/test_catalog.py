"""Segment/manifest table lifecycle tests — mirrors the reference's
dataload/segmentreading/addsegment/compaction/cleanfiles suites
(SURVEY.md §5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.catalog.manifest import SegmentStatus


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "t")


def _mkdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 5).cast("int").alias("bucket"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"))


def test_create_insert_read_count(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string",
                     {"sort_columns": ["id"], "sort_scope": "local_sort"})
    t.insert(_mkdf(spark, 0, 100))
    t.insert(_mkdf(spark, 100, 250))
    assert t.count() == 250                       # metadata-only
    assert t.read().count() == 250
    segs = t.manifest.segments()
    assert [s.id for s in segs] == [0, 1]
    assert all(s.status == SegmentStatus.SUCCESS for s in segs)
    # footer stats harvested
    assert segs[0].files[0].minmax["id"][0] == 0


def test_minmax_file_pruning(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string",
                     {"sort_columns": ["id"], "sort_scope": "global_sort"})
    for lo in range(0, 500, 100):                 # 5 disjoint segments
        t.insert(_mkdf(spark, lo, lo + 100))
    all_files = sum(len(v) for v in t.scan_files().values())
    pruned = sum(len(v) for v in t.scan_files([("id", ">=", 450)]).values())
    assert pruned < all_files                     # files skipped
    df = t.read([("id", ">=", 450)])
    assert df.count() == 50
    # point lookup prunes to one segment's files
    point = sum(len(v) for v in t.scan_files([("id", "=", 123)]).values())
    assert point <= len(t.manifest.segments()[1].files)


def test_segment_scoped_read(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.insert(_mkdf(spark, 0, 10))
    t.insert(_mkdf(spark, 10, 30))
    assert t.read(segments=[0]).count() == 10     # insegment() analogue
    assert t.read(segments=[1]).count() == 20
    assert t.count(segments=[1]) == 20


def test_insert_overwrite(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.insert(_mkdf(spark, 0, 50))
    t.insert(_mkdf(spark, 0, 10), overwrite=True)
    assert t.read().count() == 10
    assert t.count() == 10


def test_delete_segment_and_clean(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.insert(_mkdf(spark, 0, 10))
    t.insert(_mkdf(spark, 10, 20))
    t.delete_segment_by_id([0])
    assert t.count() == 10
    n = t.clean_files()
    assert n == 1
    assert not os.path.exists(os.path.join(t.table_dir, "segment_0"))
    assert t.read().count() == 10


def test_truncate(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.insert(_mkdf(spark, 0, 10))
    t.truncate()
    assert t.count() == 0


def test_compaction_minor_and_clean(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string",
                     {"sort_columns": ["id"]})
    for lo in range(0, 40, 10):
        t.insert(_mkdf(spark, lo, lo + 10))
    new_id = t.compact("minor", minor_threshold=4)
    assert new_id == 4
    assert t.count() == 40                        # data preserved
    statuses = {s.id: s.status for s in t.manifest.segments()}
    assert statuses[0] == SegmentStatus.COMPACTED
    assert statuses[4] == SegmentStatus.SUCCESS
    t.clean_files()
    assert t.read().count() == 40


def test_auto_load_merge(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string",
                     {"auto_load_merge": "true",
                      "compaction_level_threshold": "3,2"})
    for lo in range(0, 20, 10):
        t.insert(_mkdf(spark, lo, lo + 10))
    # below threshold: no merge yet
    assert all(s.status == SegmentStatus.SUCCESS
               for s in t.manifest.segments())
    t.insert(_mkdf(spark, 20, 30))
    statuses = {s.id: s.status for s in t.manifest.segments()}
    # third load tripped the auto minor compaction
    assert statuses[0] == SegmentStatus.COMPACTED
    assert statuses[3] == SegmentStatus.SUCCESS
    assert t.count() == 30
    # without the property nothing fires
    t2 = Table.create(spark, tdir + "_plain",
                      "id bigint, bucket int, name string")
    for lo in range(0, 50, 10):
        t2.insert(_mkdf(spark, lo, lo + 10))
    assert all(s.status == SegmentStatus.SUCCESS
               for s in t2.manifest.segments())


def test_compaction_custom(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    for lo in range(0, 30, 10):
        t.insert(_mkdf(spark, lo, lo + 10))
    new_id = t.compact("custom", segment_ids=[0, 1])
    assert new_id == 3
    assert t.count() == 30
    assert t.read(segments=[3]).count() == 20


def test_add_segment_mixed_format(spark, tdir, tmp_path):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.insert(_mkdf(spark, 0, 10))
    ext_parq = str(tmp_path / "ext_parquet")
    _mkdf(spark, 100, 120).write.parquet(ext_parq)
    t.add_segment(ext_parq, "parquet")
    ext_csv = str(tmp_path / "ext_csv")
    _mkdf(spark, 200, 205).write.option("header", True).csv(ext_csv)
    t.add_segment(ext_csv, "csv")
    df = t.read()
    assert df.count() == 35                       # 10 + 20 + 5 mixed formats
    assert t.count() == 35                        # csv falls back to scan


def test_ctas_and_open(spark, tdir):
    Table.create_as_select(spark, tdir, _mkdf(spark, 0, 25))
    t2 = Table.open(spark, tdir)
    assert t2.count() == 25


def test_load_csv_bad_records(spark, tdir, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,bucket,name\n1,2,a\nbad,notint,b\n3,4,c\n")
    t = Table.create(spark, tdir, "id bigint, bucket int, name string")
    t.load_csv(str(csv), schema="id bigint, bucket int, name string",
               bad_records_action="IGNORE")
    assert t.read().count() == 2                  # malformed row dropped
    t2 = Table.create(spark, str(tmp_path / "t2"),
                      "id bigint, bucket int, name string")
    t2.load_csv(str(csv), schema="id bigint, bucket int, name string",
                bad_records_action="FORCE")
    df = t2.read()
    assert df.count() == 3                        # bad cells nulled
    assert df.filter(F.col("id").isNull()).count() == 1


def test_partitioned_table_pruning(spark, tdir):
    t = Table.create(spark, tdir, "id bigint, bucket int, name string",
                     {"partition_by": ["bucket"]})
    t.insert(_mkdf(spark, 0, 100))
    files_all = sum(len(v) for v in t.scan_files().values())
    files_b1 = sum(len(v) for v in t.scan_files([("bucket", "=", 1)]).values())
    assert files_b1 < files_all
    assert t.read([("bucket", "=", 1)]).count() == 20


def test_zorder_load_prunes_on_both_dimensions(spark, tmp_path):
    """sort_scope='zorder': after one load clustered on (x, y), file
    min/max pruning must be effective for predicates on EITHER column
    — the property a linear sort only gives its leading column."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "zt"),
                     "x bigint, y bigint, v bigint",
                     {"sort_columns": ["x", "y"], "sort_scope": "zorder",
                      "global_sort_partitions": "16"})
    # 64x64 grid — x and y both uniform, uncorrelated
    grid = (spark.range(4096)
            .select((F.col("id") % 64).alias("x"),
                    (F.col("id") / 64).cast("bigint").alias("y"),
                    F.col("id").alias("v")))
    t.insert(grid)

    total = sum(len(v) for v in t.scan_files().values())
    assert total >= 8
    px = sum(len(v) for v in t.scan_files([("x", "<", 8)]).values())
    py = sum(len(v) for v in t.scan_files([("y", "<", 8)]).values())
    assert px < total / 2, (px, total)
    assert py < total / 2, (py, total)
    # correctness: pruned reads return exactly the matching rows
    assert t.read([("x", "<", 8)]).count() == 8 * 64
    assert t.read([("y", "<", 8)]).count() == 8 * 64


def test_alter_to_zorder_applies_on_next_load(spark, tmp_path):
    """sort_scope can be flipped to zorder via table properties after
    creation; the next insert writes clustered files."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "zalter"),
                     "x bigint, y bigint")
    t.set_properties({"sort_columns": ["x", "y"],
                      "sort_scope": "zorder",
                      "global_sort_partitions": "8"})
    grid = (spark.range(1024)
            .select((F.col("id") % 32).alias("x"),
                    (F.col("id") / 32).cast("bigint").alias("y")))
    t.insert(grid)
    total = sum(len(v) for v in t.scan_files().values())
    px = sum(len(v) for v in t.scan_files([("x", "<", 4)]).values())
    assert px < total


def test_date_column_stats_and_pruning(spark, tmp_path):
    """DATE columns harvest footer min/max (ISO strings — they order
    lexicographically) and prune point/range predicates given either
    a string or a datetime.date; regression for the date.isoformat
    crash in stats harvest + _norm_value."""
    import datetime
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "dates"), "id bigint, d date")
    for lo in (0, 100):
        t.insert(spark.range(lo, lo + 100).select(
            "id",
            F.date_add(F.lit("2020-01-01").cast("date"),
                       F.col("id").cast("int")).alias("d")))
    allf = sum(len(v) for v in t.scan_files().values())
    assert allf > 1
    for pred in (("d", "=", "2020-01-15"),
                 ("d", "=", datetime.date(2020, 1, 15)),
                 ("d", "between", ("2020-01-10", "2020-01-20"))):
        kept = sum(len(v) for v in t.scan_files([pred]).values())
        assert kept < allf, pred
    assert t.read(predicates=[("d", "=", "2020-01-15")]).count() == 1
    assert t.read(
        predicates=[("d", "=", datetime.date(2020, 1, 15))]).count() == 1


def test_sort_column_bounds_routing(spark, tmp_path):
    """SORT_COLUMN_BOUNDS (docs/dml-of-carbondata.md): explicit split
    points route records to n+1 range partitions under local_sort —
    files carry disjoint sort-key ranges (min/max prune-friendly)
    without a sampling pass, and every row survives."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "scb"), "id bigint, v string",
                     {"sort_columns": ["id"], "sort_scope": "local_sort"})
    t.insert(spark.range(1000).select(
        "id", F.concat(F.lit("v"), F.col("id")).alias("v")),
        sort_override={"sort_column_bounds": "250;500;750"})
    segs = t.manifest.queryable_segments()
    files = [f for s in segs for f in s.files]
    assert len(files) == 4
    ranges = sorted((f.minmax["id"][0], f.minmax["id"][1]) for f in files)
    # disjoint, covering [0, 999], split at the given bounds
    assert ranges == [(0, 249), (250, 499), (500, 749), (750, 999)]
    assert t.read().count() == 1000
    # point lookups prune to one file
    assert sum(len(v) for v in t.scan_files([("id", "=", 600)]).values()) == 1

    import pytest
    with pytest.raises(ValueError, match="SORT_COLUMN_BOUNDS"):
        t.insert(spark.range(5).select(
            "id", F.lit("x").alias("v")),
            sort_override={"sort_column_bounds": "1,2;3,4"})


def test_compaction_preserve_segments_and_major_size_prop(spark, tmp_path):
    """COMPACTION_PRESERVE_SEGMENTS shields the N latest loads from
    minor/major compaction; MAJOR_COMPACTION_SIZE table property is
    the default size cap (ddl-of-carbondata.md compaction props)."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "cp"), "id bigint",
                     {"compaction_preserve_segments": "2"})
    for lo in range(6):
        t.insert(spark.range(lo * 10, lo * 10 + 10).select("id"))
    new = t.compact("minor")
    assert new is not None
    live = {s.id for s in t.manifest.queryable_segments()}
    # segments 4 and 5 (latest two) preserved; 0-3 merged into new
    assert {4, 5, new} <= live and not ({0, 1, 2, 3} & live)
    assert t.read().count() == 60

    # MAJOR honors the property cap: 0 MB → nothing qualifies
    t2 = Table.create(spark, str(tmp_path / "cp2"), "id bigint",
                      {"major_compaction_size": "0.000001"})
    for lo in range(2):
        t2.insert(spark.range(100).select("id"))
    assert t2.compact("major") is None


def test_table_blocksize_rowgroup(spark, tmp_path):
    """TABLE_BLOCKSIZE flows into the parquet row-group size — many
    small row groups instead of one per file when set tiny."""
    import pyarrow.parquet as pq
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from pyspark.sql import functions as F

    t = Table.create(spark, str(tmp_path / "bs"),
                     "id bigint, payload string",
                     {"table_blocksize": "0.01"})       # ~10 KB groups
    t.insert(spark.range(20000).coalesce(1).select(
        "id", F.repeat(F.lit("x"), 100).alias("payload")))
    f = [f for s in t.manifest.queryable_segments() for f in s.files][0]
    n_groups = pq.ParquetFile(t._abs(f.path)).metadata.num_row_groups
    assert n_groups > 1, "tiny TABLE_BLOCKSIZE must split row groups"


def test_add_segment_orc_footer_and_scan_stats(spark, tmp_path):
    """VERDICT r9 missing-1: non-parquet ADD SEGMENT files used to get
    FileStat(rows=-1) with no min/max. Default ('footer') now harvests
    the exact ORC footer row count zero-scan; opt-in stats='scan' also
    harvests min/max for orc/csv/json so external segments file-skip
    and metadata-count like native ones."""
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from pyspark.sql import functions as F

    def jobs() -> int:
        return spark._jsparkSession.sparkContext().statusStore() \
            .jobsList(None).size()

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v bigint")
    t.insert(df.filter(F.col("id") < 40))
    orc_dir = str(tmp_path / "orc")
    df.filter((F.col("id") >= 40) & (F.col("id") < 70)) \
        .coalesce(1).write.orc(orc_dir)
    csv_dir = str(tmp_path / "csv")
    df.filter(F.col("id") >= 70).coalesce(1) \
        .write.option("header", True).csv(csv_dir)

    # default: ORC footer rows exact, no minmax; csv rows unknown
    t.add_segment(orc_dir, fmt="orc")
    orc_files = [f for s in t.manifest.queryable_segments()
                 for f in s.files if f.path.endswith(".orc")]
    assert [f.rows for f in orc_files] == [30]
    assert all(not f.minmax for f in orc_files)
    t.add_segment(csv_dir, fmt="csv")
    assert any(f.rows == -1 for s in t.manifest.queryable_segments()
               for f in s.files)

    # scan: full stats for every format; rebuild the table to re-add
    t2 = Table.create(spark, str(tmp_path / "t2"), "id bigint, v bigint")
    t2.insert(df.filter(F.col("id") < 40))
    t2.add_segment(orc_dir, fmt="orc", stats="scan")
    t2.add_segment(csv_dir, fmt="csv", stats="scan")
    ext = {f.path.rsplit(".", 1)[-1]: f
           for s in t2.manifest.queryable_segments()
           for f in s.files if not f.path.endswith(".parquet")}
    assert ext["orc"].rows == 30 and ext["orc"].minmax["id"] == [40, 69]
    assert ext["csv"].rows == 30 and ext["csv"].minmax["id"] == [70, 99]
    assert ext["csv"].minmax["v"] == [140, 198]

    # metadata-only count: exact, ZERO Spark jobs
    before = jobs()
    assert t2.count() == 100
    assert jobs() == before

    # file-skip on the external segments
    kept = [f for fs in t2.scan_files([("id", ">=", 70)]).values()
            for f in fs]
    assert all(f.endswith(".csv") for f in kept), kept
    kept = [f for fs in t2.scan_files([("id", "between", (40, 60))])
            .values() for f in fs]
    assert all(f.endswith(".orc") for f in kept), kept
    # and the data still reads back exactly
    assert t2.read().count() == 100
    got = sorted(r["id"] for r in
                 t2.read(predicates=[("id", ">=", 95)]).collect())
    assert got == [95, 96, 97, 98, 99]

    with __import__("pytest").raises(ValueError, match="stats"):
        t2.add_segment(orc_dir, fmt="orc", stats="bogus")


def test_minmax_metadata_answers_on_scanned_mixed_table(spark, tmp_path):
    """Metadata-only MIN/MAX works on a mixed-format table when the
    external files carry scan-harvested stats (exact, computed from
    the data), and still falls back to None when any queryable file
    lacks a column stat (footer-only ORC)."""
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from pyspark.sql import functions as F

    df = spark.range(100).select("id", (F.col("id") * 3).alias("v"))
    t = Table.create(spark, str(tmp_path / "mm"), "id bigint, v bigint")
    t.insert(df.filter(F.col("id") < 50))
    csv_dir = str(tmp_path / "mmcsv")
    df.filter(F.col("id") >= 50).coalesce(1) \
        .write.option("header", True).csv(csv_dir)
    t.add_segment(csv_dir, fmt="csv", stats="scan")
    assert t.manifest.minmax_metadata(["id", "v"]) == {
        "id": (0, 99), "v": (0, 297)}

    # footer-only ORC: rows known, column stats absent -> None
    orc_dir = str(tmp_path / "mmorc")
    df.filter(F.col("id") < 10).coalesce(1).write.orc(orc_dir)
    t.add_segment(orc_dir, fmt="orc")            # stats='footer'
    assert t.manifest.minmax_metadata(["id"]) is None


def test_mixed_format_custom_compaction_to_parquet(spark, tmp_path):
    """CUSTOM compaction over a mixed parquet+csv+orc table rewrites
    the chosen segments as ONE native parquet segment with full
    footer stats — the adopt-then-normalize lifecycle for external
    data (reference: compaction is format-normalizing; externals
    enter via ADD SEGMENT and leave compaction as CarbonData)."""
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from pyspark.sql import functions as F

    df = spark.range(90).select("id", (F.col("id") % 7).alias("v"))
    t = Table.create(spark, str(tmp_path / "mixc"), "id bigint, v bigint")
    t.insert(df.filter(F.col("id") < 30))                       # seg 0
    csv_dir = str(tmp_path / "mc_csv")
    df.filter((F.col("id") >= 30) & (F.col("id") < 60)) \
        .coalesce(1).write.option("header", True).csv(csv_dir)
    t.add_segment(csv_dir, fmt="csv", stats="scan")             # seg 1
    orc_dir = str(tmp_path / "mc_orc")
    df.filter(F.col("id") >= 60).coalesce(1).write.orc(orc_dir)
    t.add_segment(orc_dir, fmt="orc")                           # seg 2

    new_seg = t.compact("custom", segment_ids=[0, 1, 2])
    assert new_seg is not None
    live = {s.id: s for s in t.manifest.queryable_segments()}
    assert set(live) == {new_seg}
    assert live[new_seg].format == "parquet"
    # full footer stats on the merged segment -> metadata answers
    assert t.count() == 90
    assert t.manifest.minmax_metadata(["id"]) == {"id": (0, 89)}
    # data exact after the format normalization
    got = sorted(r["id"] for r in t.read().collect())
    assert got == list(range(90))


def test_target_filesize_governor(spark, tmp_path):
    """TARGET_FILESIZE_MB (r10): the small-file governor — an insert
    arriving in many tiny upstream partitions lands as few
    right-sized files; a local_sort table keeps every file sorted
    (sizing happens BEFORE the per-partition sort); explicit layout
    knobs (bucketing, global_sort_partitions) still win."""
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from pyspark.sql import functions as F

    wide = spark.range(20000).repartition(32).select(
        "id", F.repeat(F.lit("x"), 64).alias("pad"))

    # without the governor: one file per upstream partition
    t0 = Table.create(spark, str(tmp_path / "nogov"),
                      "id bigint, pad string")
    t0.insert(wide)
    n0 = sum(len(s.files) for s in t0.manifest.queryable_segments())
    assert n0 == 32

    # with it: file count collapses toward ceil(bytes/target)
    t1 = Table.create(spark, str(tmp_path / "gov"),
                      "id bigint, pad string",
                      {"target_filesize_mb": "4"})
    t1.insert(wide)
    n1 = sum(len(s.files) for s in t1.manifest.queryable_segments())
    assert n1 < 8, f"governor did not shrink the file count: {n1}"
    assert t1.read().count() == 20000

    # local_sort + governor: files shrink AND each file stays sorted
    t2 = Table.create(spark, str(tmp_path / "govsort"),
                      "id bigint, pad string",
                      {"target_filesize_mb": "4",
                       "sort_scope": "local_sort",
                       "sort_columns": ["id"]})
    t2.insert(wide)
    n2 = sum(len(s.files) for s in t2.manifest.queryable_segments())
    assert n2 < 8
    import pyarrow.parquet as pq
    for s in t2.manifest.queryable_segments():
        for f in s.files:
            ids = pq.read_table(t2._abs(f.path), columns=["id"])["id"] \
                .to_pylist()
            assert ids == sorted(ids), "per-file sort order broken"

    # explicit global_sort_partitions beats the governor
    t3 = Table.create(spark, str(tmp_path / "govglobal"),
                      "id bigint, pad string",
                      {"target_filesize_mb": "4",
                       "sort_scope": "global_sort",
                       "sort_columns": ["id"],
                       "global_sort_partitions": "5"})
    t3.insert(wide)
    n3 = sum(len(s.files) for s in t3.manifest.queryable_segments())
    assert n3 == 5
