"""Segment-managed table — the engine's ``CarbonTable``.

Capability parity (SURVEY.md §1.1, §2.1, §2.10):
- transactional loads (LOAD/INSERT/CTAS) with SORT_SCOPE
  (NO_SORT | LOCAL_SORT | GLOBAL_SORT | RANGE) — reference
  DataLoadProcessBuilderOnSpark.scala:71,320
- INSERT OVERWRITE, TRUNCATE
- segment management: SHOW SEGMENTS, DELETE SEGMENT BY ID/DATE,
  CLEAN FILES, segment-scoped reads (``insegment``), ADD SEGMENT
  (external dirs, mixed formats — MixedFormatHandler.scala:55-230)
- compaction MINOR / MAJOR / CUSTOM — CarbonTableCompactor.scala
- metadata count(*) — CarbonCountStar.scala:44-108
- driver-side min/max file pruning on read — CarbonInputFormat.java:540-681

Physical layout::

    <table_dir>/_meta/tablestatus.json      (atomic manifest)
    <table_dir>/segment_<id>/part-*.parquet (one dir per load)

All data movement is Spark DataFrame writes; the manifest commit is
the only custom step (write temp → harvest footer stats → atomic
JSON swap), so the scan path stays 100% Catalyst-optimized.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import time
import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pruning import Predicate, prune_files
from .manifest import Manifest, Segment, SegmentStatus
from .stats import (harvest_file, harvest_orc_footer, harvest_scan,
                    partition_values_from_relpath)

SORT_SCOPES = ("no_sort", "local_sort", "global_sort", "range_sort",
               "zorder", "hilbert")


def _hilbert_index_serial(coords: list[int], bits: int) -> int:
    """Skilling 2004 AxesToTranspose + MSB-first interleave, serial —
    the identical arithmetic the column transform below performs
    (and the same algorithm tests/test_hilbert.py pins). Drives the
    lookup-table fast path of :func:`hilbert_index_col`."""
    X = list(coords)
    n = len(X)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    X = [x ^ t for x in X]
    h = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


# cells ≤ 2^16 → the per-cell Hilbert index ships as ONE literal
# array (≤512 KB of longs) instead of a bits×dims cascade of
# data-dependent column levels
_HILBERT_LOOKUP_MAX_BITS = 16


def hilbert_index_col(df: DataFrame, x_cols: list[str],
                      bits: int, *, lookup: bool | None = None
                      ) -> DataFrame:
    """Append ``__h__`` = the Hilbert index of the integer coordinate
    columns ``x_cols`` (each in [0, 2^bits)) — Skilling 2004
    "Programming the Hilbert curve" AxesToTranspose, then MSB-first
    bit interleave of the transposed coordinates. Exactness is
    pinned against a serial reference in tests/test_hilbert.py.

    Two physical forms, identical output (r12):

    - **lookup** (auto when ``bits × dims ≤ 16``, i.e. ≤65536 cells):
      the Hilbert index of every cell is precomputed serially on the
      driver and shipped as one literal array; the row expression is
      an interleave of the coordinates plus one ``element_at``. The
      r11 column cascade spent ~1.1 s of DRIVER time per load just
      constructing/analyzing its ~25 chained withColumns at sf0.1 —
      more than the whole write job — and the resulting tree was
      evaluated twice (range-partition sampling + write; guide §1.2:
      fix the per-task work only after the job shape is right). The
      coordinate space is bounded by construction (quantile buckets),
      so the table is a few KB.
    - **column cascade** (wider keys): pure bitwise column
      expressions; every level writes a NAMED intermediate column so
      the Catalyst tree stays linear in bits × dims (inlining the
      data-dependent whens would grow it exponentially).

    The interleaved index occupies ``bits × len(x_cols)`` bits; it is
    accumulated in a LONG (the per-dim coordinates stay int — they
    only ever hold ``bits`` bits) and widths past 63 are rejected
    rather than silently wrapping the cluster key."""
    n = len(x_cols)
    if bits * n > 63:
        raise ValueError(
            f"hilbert index needs bits*dims <= 63, got {bits}*{n}="
            f"{bits * n}; lower zorder_bits or drop sort columns")
    if lookup is None:
        lookup = bits * n <= _HILBERT_LOOKUP_MAX_BITS
    if lookup:
        if bits * n > _HILBERT_LOOKUP_MAX_BITS:
            raise ValueError(
                f"hilbert lookup table needs bits*dims <= "
                f"{_HILBERT_LOOKUP_MAX_BITS}, got {bits * n}")
        side_mask = (1 << bits) - 1
        table = [
            _hilbert_index_serial(
                [(cell >> (bits * (n - 1 - i))) & side_mask
                 for i in range(n)], bits)
            for cell in range(1 << (bits * n))]
        cell = None
        for i, c in enumerate(x_cols):
            part = F.shiftleft(F.col(c).cast("long"),
                               bits * (n - 1 - i))
            cell = part if cell is None else cell.bitwiseOR(part)
        # The table ships as ONE flat binary literal (2 bytes per
        # cell — h < 2^16 by the gate above), decoded per row with
        # substring+hex+conv. An array<long> literal here would be a
        # 2^(bits×dims)-node CreateArray tree — measured at 4096
        # cells it cost MORE driver analysis time than the column
        # cascade it replaced; the flat literal is a single plan node
        # of a few KB.
        packed = b"".join(h.to_bytes(2, "big") for h in table)
        return df.withColumn(
            "__h__",
            F.conv(F.hex(F.lit(packed).substr(
                (cell * 2 + 1).cast("int"), F.lit(2))),
                16, 10).cast("long"))
    X = list(x_cols)
    work = df
    q = 1 << (bits - 1)
    step = 0
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = F.col(X[i]).bitwiseAND(F.lit(q)) != 0
            t = (F.col(X[0]).bitwiseXOR(F.col(X[i]))
                 .bitwiseAND(F.lit(p)))
            new0 = (F.when(cond, F.col(X[0]).bitwiseXOR(F.lit(p)))
                    .otherwise(F.col(X[0]).bitwiseXOR(t)))
            newi = (F.when(cond, F.col(X[i]))
                    .otherwise(F.col(X[i]).bitwiseXOR(t)))
            n0, ni = f"__hs{step}_0", f"__hs{step}_i"
            if i == 0:
                work = work.withColumn(n0, new0)
                X[0] = n0
            else:
                work = work.withColumn(n0, new0).withColumn(ni, newi)
                X[0], X[i] = n0, ni
            step += 1
        q >>= 1
    # Gray encode
    for i in range(1, n):
        nm = f"__hg{i}"
        work = work.withColumn(
            nm, F.col(X[i]).bitwiseXOR(F.col(X[i - 1])))
        X[i] = nm
    tcol = None
    q = 1 << (bits - 1)
    while q > 1:
        part = (F.when(F.col(X[n - 1]).bitwiseAND(F.lit(q)) != 0,
                       F.lit(q - 1)).otherwise(F.lit(0)))
        tcol = part if tcol is None else tcol.bitwiseXOR(part)
        q >>= 1
    work = work.withColumn("__ht",
                           tcol if tcol is not None else F.lit(0))
    for i in range(n):
        nm = f"__hf{i}"
        work = work.withColumn(
            nm, F.col(X[i]).bitwiseXOR(F.col("__ht")))
        X[i] = nm
    # interleave the transposed bits, MSB first across dims; the
    # accumulator is LONG so bits*dims up to 63 never wraps
    h = None
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            bit = (F.shiftright(F.col(X[i]), j)
                   .bitwiseAND(F.lit(1)).cast("long"))
            h = bit if h is None else F.shiftleft(h, 1).bitwiseOR(bit)
    return work.withColumn("__h__", h)

# (session id, table dir) → the parquet reader's raw file-path prefix
# (see Table._raw_path_prefix); stable for a filesystem+session
_RAW_PREFIX_CACHE: dict[tuple, str] = {}


class Table:
    def __init__(self, spark: SparkSession, table_dir: str):
        self.spark = spark
        self.table_dir = os.path.abspath(table_dir)
        self.manifest = Manifest(self.table_dir)

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(cls, spark: SparkSession, table_dir: str, schema_ddl: str,
               properties: dict | None = None) -> "Table":
        """CREATE TABLE (reference CarbonCreateTableCommand). Properties:
        sort_columns, sort_scope, range_column, partition_by, bucket_number,
        bucket_columns."""
        t = cls(spark, table_dir)
        os.makedirs(table_dir, exist_ok=True)
        t.manifest.init(schema_ddl, properties)
        return t

    @classmethod
    def create_as_select(cls, spark: SparkSession, table_dir: str,
                         df: DataFrame, properties: dict | None = None) -> "Table":
        """CTAS (reference CarbonCreateTableAsSelectCommand)."""
        t = cls.create(spark, table_dir, df.schema.simpleString(), properties)
        t.insert(df)
        return t

    @classmethod
    def open(cls, spark: SparkSession, table_dir: str) -> "Table":
        t = cls(spark, table_dir)
        if not t.manifest.exists():
            raise FileNotFoundError(f"no table at {table_dir}")
        return t

    def schema_ddl(self) -> str:
        return self.manifest.load()["schema"]

    # ------------------------------------------------- schema evolution
    #
    # Reference: CarbonAlterTableAddColumnCommand / DropColumnCommand /
    # ColRenameDataTypeChangeCommand (SURVEY.md §1.2). Like the
    # reference, evolution NEVER rewrites data files — the manifest
    # records the current schema plus rename lineage and defaults, and
    # the read path aligns every file's columns to the current schema
    # (rename chain → missing-column defaults → declared order/casts).

    _WIDENINGS = {
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
        ("float", "double"),
    }

    def _schema_struct(self):
        from pyspark.sql.types import StructType
        ddl = self.schema_ddl()
        if ddl.startswith("struct<"):
            # simpleString form → field list form
            ddl = ddl[len("struct<"):-1].replace(":", " ")
        return StructType.fromDDL(ddl)

    def _set_schema(self, struct, extra_mutate=None) -> None:
        def mutate(doc: dict) -> None:
            doc["schema"] = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in struct.fields)
            doc["schema_evolved"] = True     # read path: mergeSchema on
            if extra_mutate:
                extra_mutate(doc)
        self.manifest.update(mutate)

    def add_column(self, name: str, dtype: str, default=None) -> None:
        """ALTER TABLE ADD COLUMNS: metadata-only; old files surface the
        default (NULL unless given) on read."""
        from pyspark.sql.types import StructField, _parse_datatype_string
        struct = self._schema_struct()
        if name in struct.fieldNames():
            raise ValueError(f"column {name!r} already exists")
        struct = struct.add(StructField(name, _parse_datatype_string(dtype)))

        def extra(doc: dict) -> None:
            if default is not None:
                # segments with id < before_seg predate the column: on
                # read, every such row surfaces the default (era-exact —
                # later explicit NULLs are preserved)
                doc.setdefault("column_defaults", {})[name] = {
                    "value": default,
                    "before_seg": self.manifest.next_segment_id(doc),
                }
        self._set_schema(struct, extra)

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMNS: metadata-only; the column stays in
        old files but is projected away."""
        from pyspark.sql.types import StructType
        struct = self._schema_struct()
        if name not in struct.fieldNames():
            raise ValueError(f"no column {name!r}")
        remaining = [f for f in struct.fields if f.name != name]
        if not remaining:
            raise ValueError("cannot drop the last column")

        def extra(doc: dict) -> None:
            doc.setdefault("column_defaults", {}).pop(name, None)
        self._set_schema(StructType(remaining), extra)

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE CHANGE old new: metadata-only; rename lineage is
        kept so files written under any historical name still resolve."""
        from pyspark.sql.types import StructField, StructType
        struct = self._schema_struct()
        if old not in struct.fieldNames():
            raise ValueError(f"no column {old!r}")
        if new in struct.fieldNames():
            raise ValueError(f"column {new!r} already exists")
        fields = [StructField(new, f.dataType, f.nullable) if f.name == old else f
                  for f in struct.fields]

        def extra(doc: dict) -> None:
            renames = doc.setdefault("column_renames", [])
            renames.append([old, new])
            defaults = doc.setdefault("column_defaults", {})
            if old in defaults:
                defaults[new] = defaults.pop(old)
        self._set_schema(StructType(fields), extra)

    def change_column_type(self, name: str, new_type: str) -> None:
        """ALTER TABLE CHANGE datatype: widening only (int→bigint,
        float→double, decimal precision/scale growth) — same restriction
        as the reference."""
        from pyspark.sql.types import DecimalType, StructField, StructType, \
            _parse_datatype_string
        struct = self._schema_struct()
        if name not in struct.fieldNames():
            raise ValueError(f"no column {name!r}")
        cur = struct[name].dataType
        tgt = _parse_datatype_string(new_type)
        cur_s, tgt_s = cur.simpleString(), tgt.simpleString()
        ok = (cur_s, tgt_s) in self._WIDENINGS
        if isinstance(cur, DecimalType) and isinstance(tgt, DecimalType):
            ok = (tgt.precision >= cur.precision and tgt.scale >= cur.scale
                  and tgt.precision - tgt.scale >= cur.precision - cur.scale)
        if not ok and cur_s != tgt_s:
            raise ValueError(f"non-widening type change {cur_s} → {tgt_s}")
        fields = [StructField(name, tgt, f.nullable) if f.name == name else f
                  for f in struct.fields]
        self._set_schema(StructType(fields))

    def _align_to_schema(self, df: DataFrame,
                         era_fills: dict | None = None,
                         passthrough: Sequence[str] = ()) -> DataFrame:
        """Project any file-era schema onto the current table schema:
        apply the rename chain, fill era-applicable defaults, drop
        extras, cast to declared types in declared order. ``era_fills``
        maps column → default for columns added AFTER every file in
        this df was written (so an unconditional fill is exact).
        ``passthrough`` columns (row-identity metadata for the
        merge-on-read IUD path) survive the projection unchanged."""
        doc = self.manifest.load()
        struct = self._schema_struct()
        declared = struct.fieldNames()
        renames = doc.get("column_renames", [])
        era_fills = era_fills or {}
        same_shape = [(f.name, f.dataType.simpleString()) for f in struct.fields] \
            == [(f.name, f.dataType.simpleString())
                for f in df.schema.fields if f.name not in set(passthrough)]
        if not renames and not era_fills and same_shape:
            return df
        have = set(df.columns)
        for old, new in renames:            # oldest rename first
            if old in have and new in have:
                # mixed file eras surfaced BOTH names (mergeSchema):
                # per row exactly one is non-null
                df = df.withColumn(new, F.coalesce(F.col(new), F.col(old))) \
                       .drop(old)
                have.discard(old)
            elif old in have:
                df = df.withColumnRenamed(old, new)
                have.discard(old)
                have.add(new)
        cols = []
        for f in struct.fields:
            if f.name in have and f.name in era_fills:
                # column surfaced by mergeSchema but physically absent
                # from this era's files → every value is null → fill
                cols.append(F.coalesce(F.col(f.name).cast(f.dataType),
                                       F.lit(era_fills[f.name]).cast(f.dataType))
                            .alias(f.name))
            elif f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(era_fills.get(f.name))
                            .cast(f.dataType).alias(f.name))
        cols.extend(F.col(c) for c in passthrough if c in df.columns)
        return df.select(*cols)

    # ----------------------------------------------------------------- load

    def _target_parts(self, df: DataFrame, props: dict) -> int | None:
        """File-count target from TARGET_FILESIZE_MB (table property
        ``target_filesize_mb``): ceil(plan-estimated bytes / target).
        The small-file governor every lakehouse write path needs at
        100 TB — without it each load writes one file per upstream
        task, so a 2000-partition incremental insert of 50 MB lands
        2000 near-empty files and every later scan pays 2000 opens.
        The estimate comes from Catalyst's optimized-plan stats
        (driver-side, no job); unknown/absurd estimates disable the
        governor (None = keep the input layout).

        Catalyst's sizeInBytes is an in-memory/uncompressed figure
        while target_filesize_mb means ON-DISK bytes, and encoded+
        compressed parquet typically lands several times smaller —
        comparing them raw systematically over-splits (ADVICE r10).
        The plan estimate is therefore divided by a compression-ratio
        factor, table property ``target_filesize_compression_ratio``
        (default 3.0 — conservative for snappy parquet over mixed
        string/numeric rows; set to 1.0 to recover the raw
        plan-estimate interpretation, or higher for very
        repetitive/dictionary-friendly data)."""
        mb = props.get("target_filesize_mb")
        if not mb:
            return None
        try:
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
        except Exception:
            return None
        if size <= 0 or size > (1 << 50):      # unknown → Long.Max-ish
            return None
        try:
            comp = float(props.get(
                "target_filesize_compression_ratio", 3.0))
        except (TypeError, ValueError):
            comp = 3.0
        if comp <= 0:
            comp = 1.0
        import math
        return max(1, math.ceil(size / comp / (float(mb) * 1024 * 1024)))

    @staticmethod
    def _sized(df: DataFrame, n: int | None) -> DataFrame:
        """Re-lay df to ~n partitions: coalesce when shrinking (no
        shuffle), round-robin repartition when growing."""
        if n is None:
            return df
        cur = df.rdd.getNumPartitions()
        return df.coalesce(n) if n < cur else (
            df if n == cur else df.repartition(n))

    def _apply_load_sort(self, df: DataFrame,
                         overrides: dict | None = None) -> DataFrame:
        props = {**self.manifest.properties(), **(overrides or {})}
        scope = props.get("sort_scope", "no_sort").lower()
        sort_cols = props.get("sort_columns", [])
        range_col = props.get("range_column")
        bucket_cols = props.get("bucket_columns", [])
        bucket_n = int(props.get("bucket_number", 0) or 0)
        # TARGET_FILESIZE_MB governor — applied per scope where it
        # doesn't conflict with an explicit layout knob (bucketing
        # fixes the file count by definition; explicit
        # global_sort_partitions / sort_column_bounds win)
        tgt = self._target_parts(df, props)
        if bucket_cols and bucket_n > 0:
            # hash bucketing (reference schema.thrift:171-176 /
            # CarbonDataSourceScan bucket HashPartitioning): task i of
            # repartition(n, cols) IS bucket pmod(murmur3(cols), n), so
            # the part-index in each file name records its bucket
            df = df.repartition(bucket_n, *[F.col(c) for c in bucket_cols])
            return df.sortWithinPartitions(*sort_cols) if sort_cols else df
        if scope == "global_sort" and sort_cols:
            # GLOBAL_SORT_PARTITIONS (docs dml-of-carbondata.md load
            # option): fix the output file count; range partitioning +
            # per-partition sort is the same total order as orderBy but
            # with a deterministic file fan-out for min/max pruning
            n = int(props.get("global_sort_partitions", 0) or 0) \
                or (tgt or 0)
            if n > 0:
                # same total order as orderBy, deterministic fan-out
                return (df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
                        .sortWithinPartitions(*sort_cols))
            return df.orderBy(*sort_cols)
        if scope == "local_sort" and sort_cols:
            bounds = props.get("sort_column_bounds")
            if bounds:
                # SORT_COLUMN_BOUNDS (docs dml-of-carbondata.md): route
                # each record to the partition whose explicit bound
                # range holds its sort-key tuple (lexicographic struct
                # compare, bounds cast to the column types), then sort
                # locally — the user-supplied split points sidestep
                # sampling skew. n bounds → n+1 partitions/files.
                tuples = [b.split(",") for b in str(bounds).split(";")
                          if b.strip()]
                if any(len(t) != len(sort_cols) for t in tuples):
                    raise ValueError(
                        "SORT_COLUMN_BOUNDS: each bound needs one value "
                        f"per sort column ({len(sort_cols)})")
                types = {f.name: f.dataType
                         for f in self._schema_struct().fields}
                key = F.struct(*[F.col(c) for c in sort_cols])
                rid = F.lit(0)
                for t in tuples:
                    b = F.struct(*[F.lit(v).cast(types[c]).alias(c)
                                   for c, v in zip(sort_cols, t)])
                    rid = rid + (key >= b).cast("int")
                return (df.withColumn("__range_id", rid)
                        .repartitionByRange(len(tuples) + 1, "__range_id")
                        .sortWithinPartitions(*sort_cols)
                        .drop("__range_id"))
            return self._sized(df, tgt).sortWithinPartitions(*sort_cols)
        if scope == "range_sort" and range_col:
            n = tgt or max(df.rdd.getNumPartitions(), 1)
            return df.repartitionByRange(n, range_col)
        if scope == "zorder" and sort_cols:
            return self._apply_zorder(df, sort_cols, props)
        if scope == "hilbert" and sort_cols:
            return self._apply_hilbert(df, sort_cols, props)
        if scope not in SORT_SCOPES:
            raise ValueError(
                f"unknown sort_scope {scope!r}; one of {SORT_SCOPES}")
        return self._sized(df, tgt)

    _ZORDER_BITS = 6        # 2^6 quantile buckets per column

    def _apply_zorder(self, df: DataFrame, cols: list[str],
                      props: dict) -> DataFrame:
        """Multi-dimensional clustering (sort_scope='zorder'): each
        sort column is quantile-bucketized to 2^bits ranks (approx
        quantile sketch — distributed, no global window), the bucket
        bits are interleaved into one z-value, and files are written
        range-partitioned + sorted by it. Every file then covers a
        small hyper-rectangle, so manifest min/max pruning works on
        ALL the z-columns at once — the lakehouse OPTIMIZE ZORDER
        shape, and the generalization of the spatial index's
        geoid clustering (functions/geo.py latlng_to_geoid).
        Numeric columns only (quantile sketch requirement). The
        interleaved z-value is accumulated in a LONG (per-bit casts
        before the cross-dim shift) so bits*dims up to 63 never
        wraps; wider keys are rejected."""
        bits = int(props.get("zorder_bits", self._ZORDER_BITS))
        n = len(cols)
        if bits * n > 63:
            raise ValueError(
                f"zorder key needs bits*dims <= 63, got {bits}*{n}="
                f"{bits * n}; lower zorder_bits or drop sort columns")
        n_buckets = (1 << bits) - 1
        probs = [i / (n_buckets + 1) for i in range(1, n_buckets + 1)]
        dnum = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
        bounds = {c: sorted(set(b))
                  for c, b in zip(cols, dnum.stat.approxQuantile(
                      cols, probs, 0.01))}
        z = None
        for ci, c in enumerate(cols):
            arr = F.array(*[F.lit(b) for b in bounds[c]])
            bucket = F.size(F.filter(
                arr, lambda b: F.col(c).cast("double") >= b))
            for j in range(bits):
                part = F.shiftleft(
                    F.shiftright(bucket, j).bitwiseAND(F.lit(1))
                    .cast("long"),
                    j * n + ci)
                z = part if z is None else z.bitwiseOR(part)
        nparts = int(props.get("global_sort_partitions", 0) or 0) \
            or self._target_parts(df, props) \
            or max(df.rdd.getNumPartitions(), 1)
        return (df.withColumn("__z__", z)
                .repartitionByRange(nparts, "__z__")
                .sortWithinPartitions("__z__")
                .drop("__z__"))


    def _apply_hilbert(self, df: DataFrame, cols: list[str],
                       props: dict) -> DataFrame:
        """Hilbert-curve clustering (sort_scope='hilbert'): same
        quantile bucketization as z-order, but bucket coordinates map
        to their HILBERT index (Skilling 2004 AxesToTranspose) before
        the range-partitioned sort. The Hilbert curve preserves
        locality strictly better than the Z curve (no diagonal jumps
        between quadrants), so file hyper-rectangles are tighter and
        min/max pruning skips more — the same trade Delta/Iceberg
        expose as OPTIMIZE ZORDER vs Hilbert clustering. The bit
        transform is data-dependent per level; each level writes a
        NAMED intermediate column so the Catalyst tree stays LINEAR
        in bits × dims (inlining the whens would grow it
        exponentially). Numeric columns only."""
        bits = int(props.get("zorder_bits", self._ZORDER_BITS))
        n_buckets = (1 << bits) - 1
        probs = [i / (n_buckets + 1) for i in range(1, n_buckets + 1)]
        dnum = df.select(*[F.col(c).cast("double").alias(c)
                           for c in cols])
        bounds = {c: sorted(set(b))
                  for c, b in zip(cols, dnum.stat.approxQuantile(
                      cols, probs, 0.01))}
        n = len(cols)
        work = df
        # bucket coordinates X[0..n-1]
        for ci, c in enumerate(cols):
            arr = F.array(*[F.lit(b) for b in bounds[c]])
            work = work.withColumn(
                f"__hx{ci}", F.size(F.filter(
                    arr, lambda b: F.col(c).cast("double") >= b)))
        work = hilbert_index_col(
            work, [f"__hx{i}" for i in range(n)], bits)
        nparts = int(props.get("global_sort_partitions", 0) or 0) \
            or self._target_parts(df, props) \
            or max(df.rdd.getNumPartitions(), 1)
        drop = [c for c in work.columns if c.startswith("__h")
                and c != "__h__"]
        return (work.drop(*drop)
                .repartitionByRange(nparts, "__h__")
                .sortWithinPartitions("__h__")
                .drop("__h__"))

    def _write_segment_files(self, df: DataFrame, fmt: str = "parquet",
                             sort_override: dict | None = None) -> str:
        """Write df to a temp dir inside the table; returns tmp dir."""
        tmp = os.path.join(self.table_dir, f"_tmp_{uuid.uuid4().hex}")
        props = self.manifest.properties()
        writer = self._apply_load_sort(df, sort_override) \
            .write.mode("overwrite")
        if fmt == "parquet" and props.get("table_blocksize"):
            # TABLE_BLOCKSIZE (MB) → parquet row-group size, the
            # closest physical analogue of the reference's HDFS block
            # target (ddl-of-carbondata.md table-block-size)
            writer = writer.option(
                "parquet.block.size",
                int(float(props["table_blocksize"]) * 1024 * 1024))
        partition_by = props.get("partition_by") or []
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        getattr(writer, "parquet" if fmt == "parquet" else fmt)(tmp)
        return tmp

    @staticmethod
    def _bucket_from_filename(rel: str) -> str | None:
        """part-00007-<uuid>… → '7' (the task/bucket index)."""
        base = os.path.basename(rel)
        if base.startswith("part-"):
            try:
                return str(int(base.split("-")[1]))
            except (IndexError, ValueError):
                return None
        return None

    def _commit_segment_dir(self, tmp_dir: str, source: str,
                            overwrite: bool = False,
                            status: str = SegmentStatus.SUCCESS) -> int:
        """Move tmp files into segment_<id>/, harvest stats, swap manifest."""
        bucketed = bool(self.manifest.properties().get("bucket_columns"))
        data_files = []
        for p in sorted(glob.glob(os.path.join(tmp_dir, "**", "*"), recursive=True)):
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", ".")):
                data_files.append(os.path.relpath(p, tmp_dir))

        committed: dict[str, Any] = {}

        def mutate(doc: dict) -> None:
            seg_id = self.manifest.next_segment_id(doc)
            seg_dir = os.path.join(self.table_dir, f"segment_{seg_id}")
            os.makedirs(seg_dir, exist_ok=True)
            stats = []
            for rel in data_files:
                dst_rel = os.path.join(f"segment_{seg_id}", rel)
                dst = os.path.join(self.table_dir, dst_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(tmp_dir, rel), dst)
                parts = partition_values_from_relpath(rel)
                if bucketed:
                    b = self._bucket_from_filename(rel)
                    if b is not None:
                        parts["__bucket__"] = b
                stats.append(harvest_file(dst, dst_rel, parts))
            if overwrite:
                for s in doc["segments"]:
                    if s["status"] == SegmentStatus.SUCCESS:
                        s["status"] = SegmentStatus.MARKED_FOR_DELETE
            seg = Segment(id=seg_id, status=status, format="parquet",
                          files=stats, load_time=time.time(), source=source)
            doc["segments"].append(seg.to_json())
            committed["id"] = seg_id

        self.manifest.update(mutate)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return committed["id"]

    def _cast_to_schema(self, df: DataFrame) -> DataFrame:
        """Pre-insertion casts (reference CarbonPreInsertionCasts rule):
        align the incoming frame to the declared schema — positional
        when arity matches (INSERT SELECT semantics), so e.g. VALUES
        decimal literals land as the declared DOUBLE instead of writing
        a mixed-type parquet file."""
        struct = self._schema_struct()
        if len(df.columns) != len(struct.fields):
            raise ValueError(
                f"insert arity {len(df.columns)} != table {len(struct.fields)}")
        return df.select(*[
            F.col(c).cast(f.dataType).alias(f.name)
            for c, f in zip(df.columns, struct.fields)])

    def insert(self, df: DataFrame, overwrite: bool = False,
               source: str = "insert",
               sort_override: dict | None = None) -> int:
        """INSERT INTO/OVERWRITE as a new segment
        (reference CarbonInsertIntoCommand.scala:96-126).
        ``sort_override`` replaces sort properties for THIS load only
        (the per-load SORT_SCOPE / GLOBAL_SORT_PARTITIONS options)."""
        tmp = self._write_segment_files(self._cast_to_schema(df),
                                        sort_override=sort_override)
        seg = self._commit_segment_dir(tmp, source, overwrite=overwrite)
        self._maybe_auto_compact()
        return seg

    def _maybe_auto_compact(self) -> None:
        """Auto load merge (reference carbon.enable.auto.load.merge +
        COMPACTION_LEVEL_THRESHOLD, docs dml-of-carbondata.md
        compaction): when the table property ``auto_load_merge`` is
        'true', a MINOR compaction fires after each load once the
        un-merged load count reaches the threshold (first number of
        ``compaction_level_threshold``, default 4)."""
        props = self.manifest.properties()
        if str(props.get("auto_load_merge", "")).lower() != "true":
            return
        thr = 4
        if spec := props.get("compaction_level_threshold"):
            try:
                thr = int(str(spec).split(",")[0])
            except ValueError:
                pass
        self.compact("minor", minor_threshold=thr)

    def load_csv(self, path: str, header: bool = True,
                 delimiter: str = ",", overwrite: bool = False,
                 schema: str | None = None,
                 bad_records_action: str = "FORCE",
                 quotechar: str = '"', escapechar: str = "\\",
                 commentchar: str | None = None,
                 multiline: bool = False,
                 line_separator: str | None = None,
                 skip_empty_line: bool = True,
                 fileheader: list[str] | None = None,
                 complex_delimiter: str = "\001",
                 dateformat: str | None = None,
                 timestampformat: str | None = None,
                 sort_scope: str | None = None,
                 sort_column_bounds: str | None = None,
                 global_sort_partitions: int | None = None,
                 bad_record_path: str | None = None,
                 is_empty_data_bad_record: bool = False) -> int:
        """LOAD DATA INPATH (reference CarbonLoadDataCommand; option
        surface per docs/dml-of-carbondata.md). Bad-record actions —
        FORCE nulls bad cells, FAIL aborts, IGNORE drops bad rows,
        REDIRECT quarantines bad rows under <table>/_meta/badrecords/
        and loads the rest. QUOTECHAR/ESCAPECHAR/COMMENTCHAR/
        MULTILINE/LINE_SEPARATOR/SKIP_EMPTY_LINE map onto Spark's CSV
        reader; FILEHEADER names the columns of a headerless file;
        COMPLEX_DELIMITER_LEVEL_1 splits array<primitive> columns of
        the table schema out of delimited cells (deeper nesting needs
        the parquet/SDK path); SORT_SCOPE / GLOBAL_SORT_PARTITIONS
        override the table-level load sort FOR THIS LOAD only."""
        action = bad_records_action.upper()
        reader = (self.spark.read.option("header", header)
                  .option("delimiter", delimiter)
                  .option("quote", quotechar)
                  .option("escape", escapechar)
                  .option("multiLine", multiline))
        if commentchar:
            reader = reader.option("comment", commentchar)
        if line_separator:
            reader = reader.option("lineSep", line_separator)
        if dateformat:
            reader = reader.option("dateFormat", dateformat)
        if timestampformat:
            reader = reader.option("timestampFormat", timestampformat)
        if not skip_empty_line:
            # Spark's CSV parser always drops blank lines; loading them
            # as null rows (the reference's 'false' behavior) has no
            # Spark-side switch — refuse loudly instead of silently
            # differing
            raise NotImplementedError(
                "SKIP_EMPTY_LINE='false' (blank line → null row) is not "
                "supported by Spark's CSV reader; preprocess the file or "
                "load via the SDK path")
        sort_override = {}
        if sort_scope is not None:
            sort_override["sort_scope"] = sort_scope
        if sort_column_bounds is not None:
            sort_override["sort_column_bounds"] = sort_column_bounds
        if global_sort_partitions is not None:
            sort_override["global_sort_partitions"] = str(
                global_sort_partitions)

        def _post(df: DataFrame) -> DataFrame:
            if fileheader:
                if len(fileheader) != len(df.columns):
                    raise ValueError(
                        f"FILEHEADER names {len(fileheader)} columns, "
                        f"file has {len(df.columns)}")
                df = df.toDF(*fileheader)
            # COMPLEX_DELIMITER_LEVEL_1: table columns typed
            # array<primitive> arrive as delimited strings in the csv
            for f in self._schema_struct().fields:
                if (f.name in df.columns
                        and f.dataType.typeName() == "array"
                        and dict(df.dtypes).get(f.name) == "string"):
                    elem = f.dataType.elementType.simpleString()
                    df = df.withColumn(
                        f.name,
                        F.transform(F.split(F.col(f.name),
                                            re.escape(complex_delimiter)),
                                    lambda x: x.cast(elem)))
            return df
        # IS_EMPTY_DATA_BAD_RECORD: a row with an empty string cell
        # counts as bad and follows BAD_RECORDS_ACTION (docs
        # dml-of-carbondata.md bad-records-handling). Spark's CSV
        # reader surfaces empty input (quoted or not) as NULL for
        # string columns, so "empty data" here is NULL-or-'' — the
        # coalesce keeps the predicate two-valued (a raw NULL == ''
        # comparison is NULL and would silently drop the row from
        # BOTH the good and the bad side)
        def _empty_cell(df: DataFrame):
            scols = [c for c, t in df.dtypes if t == "string"
                     and c != "_corrupt"]
            if not scols:
                return F.lit(False)
            cond = F.lit(False)
            for c in scols:
                cond = cond | F.col(c).isNull() | (F.col(c) == "")
            return cond

        if action == "REDIRECT":
            if not schema:
                raise ValueError("REDIRECT needs an explicit schema")
            aug = schema + ", _corrupt string"
            df = (reader.schema(aug).option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", "_corrupt").csv(path))
            df = df.cache()
            is_bad = F.col("_corrupt").isNotNull()
            if is_empty_data_bad_record:
                is_bad = is_bad | _empty_cell(df)
            bad = (df.filter(is_bad)
                   .select(F.coalesce(F.col("_corrupt"),
                                      F.to_json(F.struct("*")))
                           .alias("_corrupt")))
            quarantine = bad_record_path or os.path.join(
                self.table_dir, "_meta", "badrecords", uuid.uuid4().hex)
            if bad.limit(1).count():
                bad.write.mode("overwrite").text(quarantine)
            good = df.filter(~is_bad).drop("_corrupt")
            return self.insert(_post(good), overwrite=overwrite,
                               source="load", sort_override=sort_override)
        if schema:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        mode = {"FORCE": "PERMISSIVE", "IGNORE": "DROPMALFORMED",
                "FAIL": "FAILFAST"}.get(action, "PERMISSIVE")
        df = reader.option("mode", mode).csv(path)
        if is_empty_data_bad_record:
            bad_cond = _empty_cell(df)
            if action == "FAIL":
                if df.filter(bad_cond).limit(1).count():
                    raise ValueError(
                        "bad record: empty cell with "
                        "IS_EMPTY_DATA_BAD_RECORD=true and action FAIL")
            elif action == "IGNORE":
                df = df.filter(~bad_cond)
            else:                       # FORCE: null the empty cells
                df = df.select(*[
                    F.when(F.col(c) == "", None).otherwise(F.col(c))
                    .alias(c) if t == "string" else F.col(c)
                    for c, t in df.dtypes])
        return self.insert(_post(df), overwrite=overwrite, source="load",
                           sort_override=sort_override)

    def add_segment(self, external_path: str, fmt: str = "parquet",
                    *, stats: str = "footer") -> int:
        """ADD SEGMENT: register an existing folder (any supported format)
        without copying (reference CarbonAddLoadCommand.scala:66-117).

        ``stats`` controls what the manifest learns about the external
        files (reference analogue: MixedFormatHandler.scala:55-230
        prunes ORC/parquet externals via their own footers):

        - ``'footer'`` (default, O(1) per file): parquet keeps full
          row-count + min/max from its footer; ORC keeps the exact
          footer row count (pyarrow exposes no ORC column stats);
          csv/json get ``rows=-1`` (metadata count disabled, pruning
          conservatively keeps them).
        - ``'scan'`` (opt-in, one local read per file): csv/json/orc
          additionally harvest exact rows + per-column min/max, so
          external segments file-skip and metadata-count like native
          ones. Same cost the reference pays harvesting at LOAD.
        """
        if stats not in ("footer", "scan"):
            raise ValueError(f"stats={stats!r}: 'footer' or 'scan'")
        exts = {"parquet": "*.parquet", "orc": "*.orc",
                "csv": "*.csv", "json": "*.json"}
        pattern = exts.get(fmt, "*")
        files = sorted(glob.glob(os.path.join(external_path, "**", pattern),
                                 recursive=True))
        if not files:
            raise FileNotFoundError(f"no {fmt} files under {external_path}")
        stats_rows = []
        for p in files:
            if fmt == "parquet":
                stats_rows.append(harvest_file(p, p))     # abs path kept
            elif stats == "scan":
                stats_rows.append(harvest_scan(p, p, fmt))
            elif fmt == "orc":
                stats_rows.append(harvest_orc_footer(p, p))
            else:
                from .manifest import FileStat
                stats_rows.append(FileStat(path=p, rows=-1,
                                           bytes=os.path.getsize(p)))
        stats = stats_rows

        def mutate(doc: dict) -> None:
            seg_id = self.manifest.next_segment_id(doc)
            seg = Segment(id=seg_id, status=SegmentStatus.SUCCESS, format=fmt,
                          files=stats, load_time=time.time(),
                          source="add_segment", external_path=external_path)
            doc["segments"].append(seg.to_json())

        self.manifest.update(mutate)
        return self.manifest.next_segment_id() - 1

    # -------------------------------------------------- table properties

    def set_properties(self, props: dict[str, str]) -> None:
        """ALTER TABLE SET TBLPROPERTIES (reference
        CarbonAlterTableSetCommand.scala): metadata-only merge."""
        def mutate(doc: dict) -> None:
            doc.setdefault("properties", {}).update(props)
        self.manifest.update(mutate)

    def unset_properties(self, keys: Sequence[str]) -> None:
        """ALTER TABLE UNSET TBLPROPERTIES (reference
        CarbonAlterTableUnsetCommand.scala)."""
        def mutate(doc: dict) -> None:
            for k in keys:
                doc.setdefault("properties", {}).pop(k, None)
        self.manifest.update(mutate)

    def show_create(self, name: str) -> str:
        """SHOW CREATE TABLE DDL text (reference
        CarbonShowCreateTableCommand.scala)."""
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in self._schema_struct().fields)
        props = self.manifest.properties()
        out = f"CREATE TABLE {name} (\n  {cols}\n)"
        if props:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            out += f"\nTBLPROPERTIES ({kv})"
        return out

    # ------------------------------------------------------------ staging

    def insert_stage(self, batch_file_count: int | None = None) -> int | None:
        """INSERT INTO t STAGE: commit stage entries written by
        external SDK writers (SdkStageWriter) as ONE new segment
        (reference CarbonInsertFromStageCommand.scala:71-183; parser
        CarbonSpark2SqlParser.scala:556-564 with option
        'batch_file_count'). Oldest entries first; ``.stage`` metadata
        files are removed only after the manifest commit, and a crash
        in between is healed on the next call (metadata whose data
        files were already moved is dropped — the reference recovers
        analogously via its stage snapshot file, L94-111).
        Returns the new segment id, or None if the stage is empty."""
        import json as _json
        stage_dir = os.path.join(self.table_dir, "stage")
        metas = sorted(glob.glob(os.path.join(stage_dir, "*.stage")),
                       key=os.path.getmtime)
        if batch_file_count is not None:
            metas = metas[:batch_file_count]
        if not metas:
            return None
        rels: list[str] = []
        live_metas: list[str] = []
        for mp in metas:
            with open(mp) as f:
                files = _json.load(f)["files"]
            if all(os.path.exists(os.path.join(stage_dir, r)) for r in files):
                rels.extend(files)
                live_metas.append(mp)
            else:
                # crash recovery: files already moved by a previous
                # insert_stage that died before removing the metadata
                os.remove(mp)
        metas = live_metas
        if not metas:
            return None
        committed: dict[str, int] = {}

        def mutate(doc: dict) -> None:
            seg_id = self.manifest.next_segment_id(doc)
            seg_dir = os.path.join(self.table_dir, f"segment_{seg_id}")
            os.makedirs(seg_dir, exist_ok=True)
            stats = []
            for rel in rels:
                dst_rel = os.path.join(f"segment_{seg_id}", rel)
                os.rename(os.path.join(stage_dir, rel),
                          os.path.join(self.table_dir, dst_rel))
                stats.append(harvest_file(
                    os.path.join(self.table_dir, dst_rel), dst_rel))
            doc["segments"].append(Segment(
                id=seg_id, status=SegmentStatus.SUCCESS, format="parquet",
                files=stats, load_time=time.time(),
                source="insert_stage").to_json())
            committed["id"] = seg_id

        self.manifest.update(mutate)
        for mp in metas:
            os.remove(mp)
        return committed["id"]

    def delete_stage(self, retain_hour: float = 0.0) -> int:
        """DELETE FROM TABLE t STAGE: garbage-collect orphan stage
        data files (no ``.stage`` metadata references them — e.g. a
        writer crashed between data and metadata) older than
        ``retain_hour`` (reference CarbonDeleteStageFilesCommand)."""
        import json as _json
        stage_dir = os.path.join(self.table_dir, "stage")
        if not os.path.isdir(stage_dir):
            return 0
        referenced: set[str] = set()
        for mp in glob.glob(os.path.join(stage_dir, "*.stage")):
            with open(mp) as f:
                referenced.update(_json.load(f)["files"])
        cutoff = time.time() - retain_hour * 3600
        removed = 0
        for p in glob.glob(os.path.join(stage_dir, "*.parquet")):
            if (os.path.basename(p) not in referenced
                    and os.path.getmtime(p) <= cutoff):
                os.remove(p)
                removed += 1
        return removed

    # ----------------------------------------------------- hive partitions

    def show_partitions(self) -> list[dict[str, str]]:
        """Distinct hive-partition value sets across queryable files
        (reference CarbonShowCarbonPartitionsCommand)."""
        seen: list[dict[str, str]] = []
        part_cols = self.manifest.properties().get("partition_by") or []
        for seg in self.manifest.queryable_segments():
            for f in seg.files:
                spec = {c: f.partition[c] for c in part_cols
                        if c in f.partition}
                if spec and spec not in seen:
                    seen.append(spec)
        return sorted(seen, key=lambda d: sorted(d.items()))

    def add_partition(self, spec: dict[str, str], location: str,
                      fmt: str = "parquet") -> int:
        """ALTER TABLE ADD PARTITION (reference
        CarbonAlterTableAddHivePartitionCommand.scala): register an
        external folder as one segment whose files all carry the given
        partition values (no copy)."""
        seg_id = self.add_segment(location, fmt=fmt)

        def mutate(doc: dict) -> None:
            for s in doc["segments"]:
                if s["id"] == seg_id:
                    for f in s["files"]:
                        f.setdefault("partition", {}).update(
                            {k: str(v) for k, v in spec.items()})

        self.manifest.update(mutate)
        return seg_id

    def drop_partition(self, spec: dict[str, str]) -> int:
        """ALTER TABLE DROP PARTITION: logically remove every file whose
        partition values match the spec (physical removal is CLEAN
        FILES, same split as segment deletes)."""
        dropped = 0

        def mutate(doc: dict) -> None:
            nonlocal dropped
            for s in doc["segments"]:
                kept = []
                for f in s["files"]:
                    p = f.get("partition", {})
                    if all(p.get(k) == str(v) for k, v in spec.items()):
                        dropped += 1
                    else:
                        kept.append(f)
                s["files"] = kept

        self.manifest.update(mutate)
        return dropped

    def truncate(self) -> None:
        """TRUNCATE TABLE (reference CarbonTruncateCommand)."""
        def mutate(doc: dict) -> None:
            for s in doc["segments"]:
                if s["status"] in (SegmentStatus.SUCCESS, SegmentStatus.STREAMING,
                                   SegmentStatus.STREAMING_FINISH):
                    s["status"] = SegmentStatus.MARKED_FOR_DELETE
            # merge-on-read delete deltas reference the truncated
            # files; the sidecars become unreferenced (CLEAN FILES
            # sweeps them physically)
            doc.pop("delete_deltas", None)
        self.manifest.update(mutate)

    def restore(self, version: int) -> None:
        """RESTORE the table to a historical manifest version (the
        lakehouse RESTORE/rollback primitive; composes with the same
        versioned-tablestatus history that powers ``read(as_of=)``).
        The restore is itself a NEW manifest version whose content
        replays version N — history is append-only, so a restore can
        be restored away again, and concurrent readers pinned to
        other versions are unaffected. Fails fast if any data file of
        the target version has been physically removed (CLEAN FILES
        after the fact makes old versions unrestorable — same
        contract as Delta RESTORE after VACUUM)."""
        target = self.manifest.load(version, _attach=False)
        target = (self.manifest._attach_files(dict(target))
                  if target.get("files_ref") else target)
        missing = [f["path"] for s in target["segments"]
                   if s["status"] in (SegmentStatus.SUCCESS,
                                      SegmentStatus.STREAMING,
                                      SegmentStatus.STREAMING_FINISH)
                   for f in s["files"]
                   if not os.path.exists(self._abs(f["path"]))]
        missing += [d["path"] for d in target.get("delete_deltas", [])
                    if not os.path.exists(self._abs(d["path"]))]
        if missing:
            raise FileNotFoundError(
                f"cannot restore to version {version}: "
                f"{len(missing)} data file(s) physically removed "
                f"(e.g. {missing[0]!r}) — CLEAN FILES already swept them")

        def mutate(doc: dict) -> None:
            keep_version = doc["version"]
            doc.clear()
            doc.update({k: v for k, v in target.items()
                        if k not in ("version", "files_ref")})
            doc["version"] = keep_version
        self.manifest.update(mutate)

    # ----------------------------------------------------------------- read

    def _abs(self, f_path: str) -> str:
        return f_path if os.path.isabs(f_path) else os.path.join(self.table_dir, f_path)

    @property
    def indexes(self):
        from .index import IndexManager
        return IndexManager(self)

    @property
    def vector_indexes(self):
        from .vector_index import VectorIndexManager
        return VectorIndexManager(self)

    _BUCKET_IN_CAP = 64     # max key combinations hashed for IN pruning

    def _bucket_targets(
            self, predicates: Sequence[Predicate] | None) -> set[str] | None:
        """Bucket ids implied by `=` / `IN` predicates covering ALL
        bucket columns, else None (reference CarbonDataSourceScan
        bucket HashPartitioning; repartition task i == pmod(murmur3,
        n)). An IN-list yields the union of its values' buckets; the
        combination count is capped — past the cap a full scan is
        cheaper than hashing thousands of key tuples anyway."""
        props = self.manifest.properties()
        bucket_cols = props.get("bucket_columns", [])
        n = int(props.get("bucket_number", 0) or 0)
        if not bucket_cols or n <= 0 or not predicates:
            return None
        cands: dict[str, list] = {}
        for c, op, v in predicates:
            if c not in bucket_cols:
                continue
            if op == "=":
                cands.setdefault(c, []).append(v)
            elif op == "in":
                cands.setdefault(c, []).extend(v)
        if not all(c in cands for c in bucket_cols):
            return None
        combos = 1
        for c in bucket_cols:
            combos *= len(cands[c])
        if combos > self._BUCKET_IN_CAP:
            return None
        # literals must hash with the COLUMN's type: murmur3(42: int)
        # != murmur3(42: bigint), and HashPartitioning used the column
        types = {f.name: f.dataType for f in self._schema_struct().fields}

        def lit(c, v):
            return F.lit(v).cast(types[c]) if c in types else F.lit(v)

        import itertools
        exprs = [F.pmod(F.hash(*[lit(c, v) for c, v in zip(bucket_cols, tup)]),
                        F.lit(n))
                 for tup in itertools.product(*[cands[c] for c in bucket_cols])]
        row = (self.spark.range(1)
               .select(F.array(*exprs).alias("bs")).first())
        return {str(int(b)) for b in row["bs"]}

    def scan_files(self, predicates: Sequence[Predicate] | None = None,
                   segments: list[int] | None = None,
                   use_indexes: bool = True) -> dict[str, list[str]]:
        """Pruned file list per format: driver-side min/max + partition +
        bucket + segment-scope pruning, then SI/bloom index intersection
        (``use_indexes=False`` is the NI() escape hatch —
        reference CarbonEnv.scala:86-95)."""
        allowed = self.indexes.candidate_files(predicates) if use_indexes else None
        target_buckets = self._bucket_targets(predicates)
        by_fmt: dict[str, list[str]] = {}
        # vectorized path (manifest.stats='parquet'): prune runs as
        # pyarrow compute over the stats sidecar; only survivors ever
        # become Python objects, segment metadata stays O(segments)
        pruned = self.manifest.pruned_filestats(predicates, segments)
        segs = (self.manifest.queryable_segment_meta(segments)
                if pruned is not None
                else self.manifest.queryable_segments(segments))
        for seg in segs:
            kept = (pruned.get(seg.id, []) if pruned is not None
                    else prune_files(seg.files, predicates))
            if allowed is not None:
                kept = [f for f in kept if self._abs(f.path) in allowed]
            if target_buckets is not None:
                kept = [f for f in kept
                        if f.partition.get("__bucket__") is None
                        or f.partition["__bucket__"] in target_buckets]
            if kept:
                by_fmt.setdefault(seg.format, []).extend(
                    self._abs(f.path) for f in kept)
        return by_fmt

    def history(self) -> list[int]:
        """Available manifest versions for time travel."""
        return self.manifest.versions()

    # broadcast the delete-delta side of the merge-on-read anti-join
    # while it comfortably fits executor memory ((path, pos) rows,
    # ~64 B each → ~256 MB); beyond that Spark's planner picks a
    # shuffled anti-join on (file, pos) — both sides scale out
    _DELTA_BROADCAST_ROWS = 4_000_000

    def _raw_path_prefix(self) -> str | None:
        """The parquet reader's ``_metadata.file_path`` rendering of
        this table's directory prefix (e.g. ``file:/abs/dir/``),
        probed once with a one-row job and cached per (session,
        table dir). The delete-delta anti-join keys on the RAW
        reader string so the big scan side does zero per-row path
        surgery — the small delta side rebuilds raw = prefix + rel."""
        key = (id(self.spark), os.path.abspath(self.table_dir))
        if key in _RAW_PREFIX_CACHE:
            return _RAW_PREFIX_CACHE[key]
        rel = next((f.path for s in self.manifest.queryable_segments()
                    for f in s.files
                    if s.format == "parquet" and f.rows != 0), None)
        if rel is None:
            return None
        row = (self.spark.read.parquet(self._abs(rel))
               .select(F.col("_metadata.file_path").alias("p"))
               .limit(1).first())
        if row is None or not row["p"].endswith(rel):
            return None                 # unexpected rendering — the
        prefix = row["p"][:-len(rel)]   # caller falls back to per-row
        # normalization (always sound)
        _RAW_PREFIX_CACHE[key] = prefix
        return prefix

    def _delete_delta_df(self, doc: dict) -> DataFrame | None:
        """Union of the table's delete-delta sidecars as a
        (__dd_fp, __dd_p) DataFrame for the read-path anti-join, or
        None when the table has no deltas (the common case costs
        nothing — no plan change at all). ``__dd_fp`` is the RAW
        reader path (prefix + stored relative path) so the scan side
        joins directly on ``_metadata.file_path``. Merge-on-read
        analogue of the reference's per-block delete-delta bitmaps
        (core/.../mutate/CarbonUpdateUtil.java, DeleteDeltaBlockDetails)."""
        deltas = doc.get("delete_deltas") or []
        if not deltas:
            return None
        prefix = self._raw_path_prefix()
        dd = self.spark.read.parquet(
            *[self._abs(d["path"]) for d in deltas])
        if prefix is not None:
            fp = F.concat(F.lit(prefix), F.col("file"))
        else:                           # probe failed: normalize later
            fp = F.col("file")          # (scan side normalizes too)
        dd = dd.select(fp.alias("__dd_fp"), F.col("pos").alias("__dd_p"))
        if sum(d["rows"] for d in deltas) <= self._DELTA_BROADCAST_ROWS:
            dd = F.broadcast(dd)
        return dd

    def _rel_path_col(self) -> F.Column:
        """Table-relative path from the raw ``_metadata.file_path`` —
        the canonical, relocation-safe form stored in delta sidecars.
        Per-row string surgery, so only rowpos consumers (IUD hit
        sets, already filtered small) evaluate it."""
        prefix = os.path.abspath(self.table_dir) + os.sep
        norm = F.regexp_replace(F.col("_metadata.file_path"),
                                "^file:/+", "/")
        return F.substring(norm, len(prefix) + 1, (1 << 31) - 1)

    def _apply_deltas(self, df: DataFrame, dd_df: DataFrame) -> DataFrame:
        """Anti-join a parquet scan against the delete deltas on
        (file key, row position). The file key is the RAW
        ``_metadata.file_path`` — already materialized by the reader,
        zero per-row string work — unless the prefix probe failed
        (then both sides normalize to relative paths, always sound)."""
        raw = self._raw_path_prefix() is not None
        fp = (F.col("_metadata.file_path") if raw
              else self._rel_path_col())
        had_pos = "__dd_p" in df.columns   # rowpos caller keeps it
        cols = {"__dd_fp": fp}
        if not had_pos:
            cols["__dd_p"] = F.col("_metadata.row_index")
        df = (df.withColumns(cols)
              .join(dd_df, ["__dd_fp", "__dd_p"], "left_anti")
              .drop("__dd_fp"))
        return df if had_pos else df.drop("__dd_p")

    def read(self, predicates: Sequence[Predicate] | None = None,
             segments: list[int] | None = None,
             apply_predicates: bool = True,
             use_indexes: bool = True,
             as_of: int | None = None,
             bucket_id: int | None = None,
             with_rowpos: bool = False,
             only_files: set | None = None) -> DataFrame:
        """Scan with driver-side pruning; mixed-format segments are
        unioned by name (reference MixedFormatHandler.scala:55-230).
        Spark re-evaluates predicates exactly — pruning is only a skip.

        ``as_of=N`` reads the segment set of manifest version N (segment
        time travel over tablestatus history — valid until CLEAN FILES
        physically removes the data of deleted/compacted segments).

        ``bucket_id=b`` restricts the scan to files of hash bucket b
        (for the bucket-map join in ``operators.bucketed``); requires
        every queryable file to carry bucket info — a mixed pre/post
        bucketing history would silently drop rows otherwise.

        ``with_rowpos=True`` keeps the (__dd_f, __dd_p) row-identity
        columns on the result (parquet segments only) — the
        merge-on-read IUD path's tuple id.

        ``only_files`` (absolute paths) restricts the scan to those
        files while keeping EVERY read-path semantic — era-default
        fills, rename alignment, delete-delta anti-join — which is
        what a rewrite must read through (a raw parquet rescan would
        silently materialize NULLs where era defaults apply).

        Merge-on-read delete deltas (``'iud.mode'='mor'`` tables) are
        applied here, so every consumer — query, index build, FTS
        refine, MV refresh, compaction rewrite — sees post-delete
        rows. Deltas live in the manifest doc, so ``as_of`` reads
        apply exactly the deltas known at that version."""
        doc = self.manifest.load(as_of, _attach=False)
        dd_df = self._delete_delta_df(doc)
        # files actually carrying deltas (per-entry lists, reference's
        # per-block delta attribution) — clean files skip the
        # anti-join entirely; None = every file joins (a huge delete
        # dropped its list)
        dd_files: set | None = None
        if dd_df is not None:
            lists = [d.get("files") for d in doc["delete_deltas"]]
            if all(li is not None for li in lists):
                dd_files = set().union(*lists)
        defaults = doc.get("column_defaults", {})
        # SI/bloom indexes describe the CURRENT file set — using them to
        # prune a historical snapshot could drop rewritten-away files
        allowed = (self.indexes.candidate_files(predicates)
                   if use_indexes and as_of is None else None)
        partitioned = bool(self.manifest.properties().get("partition_by"))

        target_buckets = self._bucket_targets(predicates)
        if bucket_id is not None:
            if target_buckets is not None and str(bucket_id) not in target_buckets:
                # predicate-implied buckets disagree → empty scan
                return self.read(segments=[-1])
            target_buckets = {str(bucket_id)}
            for seg in self.manifest.queryable_segments(segments, version=as_of):
                for f in seg.files:
                    if "__bucket__" not in f.partition:
                        raise ValueError(
                            f"file {f.path} has no bucket info; "
                            "bucket-scoped read needs a fully bucketed table")

        # Time-travel reads fail FAST when CLEAN FILES already swept a
        # file of the pinned version — a clear engine error naming the
        # swept segment instead of a mid-scan FileNotFoundException
        # from a random executor task (same contract restore() gives;
        # Delta after VACUUM behaves identically). Only checked for
        # as_of reads: current-version files are lifecycle-protected.
        swept: list[tuple[str, str]] = []
        if as_of is not None:
            swept = [("delete-delta", d["path"])
                     for d in (doc.get("delete_deltas") or [])
                     if not os.path.exists(self._abs(d["path"]))]
        # group surviving files by (format, evolution era): a segment's
        # era decides which added-column defaults fill it on read
        groups: dict[tuple, list[str]] = {}
        pruned = self.manifest.pruned_filestats(predicates, segments,
                                                version=as_of)
        segs = (self.manifest.queryable_segment_meta(segments, version=as_of)
                if pruned is not None
                else self.manifest.queryable_segments(segments,
                                                      version=as_of))
        for seg in segs:
            kept = (pruned.get(seg.id, []) if pruned is not None
                    else prune_files(seg.files, predicates))
            if allowed is not None:
                kept = [f for f in kept if self._abs(f.path) in allowed]
            if target_buckets is not None:
                # files without bucket info (pre-bucketing loads) stay
                kept = [f for f in kept
                        if f.partition.get("__bucket__") is None
                        or f.partition["__bucket__"] in target_buckets]
            if only_files is not None:
                kept = [f for f in kept if self._abs(f.path) in only_files]
            if not kept:
                continue
            fills = tuple(sorted(
                (c, spec["before_seg"], spec["value"])
                for c, spec in defaults.items() if seg.id < spec["before_seg"]))
            # external segments of a partitioned table (ADD PARTITION
            # LOCATION ...) carry partition values only in the manifest,
            # not as hive dirs — inject them as literal columns at read
            ext_spec: tuple = ()
            if partitioned and seg.external_path and kept:
                pcols = self.manifest.properties().get("partition_by") or []
                ext_spec = tuple((c, kept[0].partition[c])
                                 for c in pcols if c in kept[0].partition)
            if as_of is not None:
                swept += [(f"segment {seg.id}", f.path) for f in kept
                          if not os.path.exists(self._abs(f.path))]
            for f in kept:
                # split parquet scans into delta-carrying vs clean
                # files — clean files never pay the anti-join
                needs_dd = (dd_df is not None and seg.format == "parquet"
                            and (dd_files is None or f.path in dd_files))
                groups.setdefault(
                    (seg.format, fills, ext_spec, needs_dd), []).append(
                    self._abs(f.path))
        if swept:
            where, example = swept[0]
            raise FileNotFoundError(
                f"cannot read as_of={as_of}: {len(swept)} data file(s) "
                f"of that version physically removed ({where}, e.g. "
                f"{example!r}) — CLEAN FILES already swept them; the "
                "version is no longer time-travelable")

        dfs: list[DataFrame] = []
        for (fmt, fills, ext_spec, needs_dd), files in groups.items():
            if fmt == "parquet":
                reader = self.spark.read
                if partitioned and not ext_spec:
                    # recover hive-style partition columns from paths
                    reader = reader.option("basePath", self.table_dir)
                if doc.get("schema_evolved"):
                    # file eras have different footers; without this the
                    # inferred schema comes from one sampled footer and
                    # evolution-era columns silently vanish
                    reader = reader.option("mergeSchema", True)
                part = reader.parquet(*files)
            elif fmt == "orc":
                part = self.spark.read.orc(*files)
            elif fmt == "csv":
                part = (self.spark.read.option("header", True)
                        .option("inferSchema", True).csv(files))
            elif fmt == "json":
                part = self.spark.read.json(files)
            else:
                raise ValueError(f"unsupported segment format {fmt}")
            keep_pos = ()
            if fmt == "parquet" and (needs_dd or with_rowpos):
                if with_rowpos:
                    # relative-path surgery rides below the join so
                    # _metadata stays resolvable; Catalyst prunes it
                    # when the caller doesn't use it
                    part = part.withColumns({
                        "__dd_f": self._rel_path_col(),
                        "__dd_p": F.col("_metadata.row_index")})
                    keep_pos = ("__dd_f", "__dd_p")
                if needs_dd:
                    part = self._apply_deltas(part, dd_df)
            elif with_rowpos:
                raise ValueError(
                    "with_rowpos/merge-on-read IUD requires parquet "
                    f"segments; found format {fmt!r}")
            for c, v in ext_spec:
                part = part.withColumn(c, F.lit(v))
            dfs.append(self._align_to_schema(
                part, {c: v for c, _, v in fills}, passthrough=keep_pos))
        if not dfs:
            # fully-pruned scan: build the empty relation JVM-side —
            # createDataFrame([], ddl) is RDD-backed (Scan ExistingRDD
            # over default parallelism, ~0.5 s per job and 2.5 s cold);
            # range(0)+typed null casts optimizes to an empty
            # LocalRelation, so "index pruned everything" costs ~nothing
            from pyspark.sql.types import _parse_datatype_string
            st = _parse_datatype_string(self.schema_ddl())
            cols = [F.lit(None).cast(f.dataType).alias(f.name)
                    for f in st.fields]
            if with_rowpos:
                cols += [F.lit(None).cast("string").alias("__dd_f"),
                         F.lit(None).cast("bigint").alias("__dd_p")]
            return self.spark.range(0).select(*cols)
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        if predicates and apply_predicates:
            for col, op, value in predicates:
                c = F.col(col)
                if op == "=":
                    df = df.filter(c == value)
                elif op == "!=":
                    df = df.filter(c != value)
                elif op == "<":
                    df = df.filter(c < value)
                elif op == "<=":
                    df = df.filter(c <= value)
                elif op == ">":
                    df = df.filter(c > value)
                elif op == ">=":
                    df = df.filter(c >= value)
                elif op == "in":
                    df = df.filter(c.isin(list(value)))
                elif op == "between":
                    df = df.filter(c.between(value[0], value[1]))
                elif op == "ranges":
                    # exact re-evaluation is a bucketed hash semi-join
                    # (see functions.geo.range_list_semi_join); here the
                    # rows already passed file-level pruning, so a plain
                    # OR-of-BETWEEN would also be sound but blows up
                    # codegen for large lists — delegate to the join.
                    from ..functions.geo import range_list_semi_join
                    df = range_list_semi_join(df, col, list(value))
                else:
                    raise ValueError(f"unsupported predicate op {op!r}")
        return df

    def count(self, segments: list[int] | None = None) -> int:
        """Metadata-only count(*) (CarbonCountStar analogue). Falls back
        to a scan for formats without footer counts. Merge-on-read
        delete deltas subtract exactly: every delta row references a
        file of a currently-queryable segment (any file-dropping op —
        compaction, MERGE rewrite, DELETE SEGMENT — re-trims the
        consolidated delta, operators/mor.py), so total = footer rows
        − delta rows. Segment-scoped counts under deltas scan (the
        delta's per-segment attribution isn't in the manifest)."""
        deltas = self.manifest.load().get("delete_deltas") or []
        if deltas and segments is not None:
            return self.read(segments=segments).count()
        segs = self.manifest.queryable_segments(segments)
        if any(f.rows < 0 for s in segs for f in s.files):
            return self.read(segments=segments).count()
        return sum(f.rows for s in segs for f in s.files) \
            - sum(d["rows"] for d in deltas)

    # ------------------------------------------------------- segment mgmt

    def show_segments(self, history: bool = False,
                      limit: int | None = None) -> DataFrame:
        """SHOW [HISTORY] SEGMENTS as a DataFrame (reference
        CarbonShowSegmentsCommand): visible (queryable) segments only
        unless ``history``; ``limit`` keeps the N largest segment
        ids (docs segment-management-on-carbondata.md:54-65)."""
        from .manifest import QUERYABLE
        segs = [s for s in self.manifest.segments()
                if history or s.status in QUERYABLE]
        segs.sort(key=lambda s: -s.id)
        if limit is not None:
            segs = segs[:limit]
        rows = [(s.id, s.status, s.format, s.source, s.rows, s.bytes,
                 len(s.files), s.load_time)
                for s in segs]
        return self.spark.createDataFrame(
            rows, "id int, status string, format string, source string, "
                  "rows bigint, bytes bigint, n_files int, load_time double")

    def delete_segment_by_id(self, ids: list[int]) -> None:
        wanted = set(ids)

        def mutate(doc: dict) -> None:
            for s in doc["segments"]:
                if s["id"] in wanted and s["status"] == SegmentStatus.SUCCESS:
                    s["status"] = SegmentStatus.MARKED_FOR_DELETE
        self.manifest.update(mutate)
        self._trim_deltas()

    def delete_segment_by_date(self, before_ts: float) -> None:
        def mutate(doc: dict) -> None:
            for s in doc["segments"]:
                if s["status"] == SegmentStatus.SUCCESS and s["load_time"] < before_ts:
                    s["status"] = SegmentStatus.MARKED_FOR_DELETE
        self.manifest.update(mutate)
        self._trim_deltas()

    def _trim_deltas(self) -> None:
        """Re-consolidate merge-on-read delete deltas after an op that
        dropped files from the queryable set, preserving the count()
        invariant (every delta row references a live file)."""
        if self.manifest.load().get("delete_deltas"):
            from ..operators.mor import horizontal_compact
            horizontal_compact(self, force=True)

    def clean_files(self, *, force: bool = False,
                    stale_inprogress: bool = False,
                    dryrun: bool = False) -> int | dict:
        """CLEAN FILES (reference CarbonCleanFilesCommand; docs
        clean-files.md). Default: MARKED_FOR_DELETE / COMPACTED
        segments leave the manifest and their data moves to the table
        TRASH (``.trash/``); trash entries older than
        ``carbon.trash.retention.days`` (default 7) are purged on
        every run — so a fat-fingered clean is recoverable for the
        retention window. Options mirror the reference:

        - ``force``: delete immediately AND empty the trash; gated by
          table property ``carbon.clean.file.force.allowed`` exactly
          as the reference gates it on the carbon property.
        - ``stale_inprogress``: also clean INSERT_IN_PROGRESS
          segments past retention age (a crashed writer's leftovers);
          with ``force``, immediately.
        - ``dryrun``: report what WOULD be cleaned + current trash
          size, mutate nothing (returns a dict).

        Returns number of segments cleaned (int), or the dryrun dict."""
        props = self.manifest.properties()
        if force and str(props.get("carbon.clean.file.force.allowed",
                                   "false")).lower() != "true":
            raise PermissionError(
                "clean files with force requires table property "
                "carbon.clean.file.force.allowed=true (reference "
                "carbon.clean.file.force.allowed, docs/clean-files.md)")
        retention_s = float(
            props.get("carbon.trash.retention.days", 7)) * 86400.0
        trash_root = os.path.join(self.table_dir, ".trash")
        now = time.time()

        def _dir_bytes(d: str) -> int:
            return sum(os.path.getsize(os.path.join(r, f))
                       for r, _, fs in os.walk(d) for f in fs)

        def _stale_iip(s: dict) -> bool:
            return (stale_inprogress
                    and s["status"] == SegmentStatus.INSERT_IN_PROGRESS
                    and (force or now - s["load_time"] > retention_s))

        if dryrun:
            doc = self.manifest.load(_attach=False)
            would = [s["id"] for s in doc["segments"]
                     if s["status"] in (SegmentStatus.MARKED_FOR_DELETE,
                                        SegmentStatus.COMPACTED)
                     or _stale_iip(s)]
            trash_bytes = (_dir_bytes(trash_root)
                           if os.path.isdir(trash_root) else 0)
            return {"would_clean_segments": would,
                    "trash_bytes": trash_bytes,
                    "force": force, "stale_inprogress": stale_inprogress}

        cleaned = {"n": 0}

        def _dispose(seg_dir: str, sid) -> None:
            if not os.path.isdir(seg_dir):
                return
            if force:
                shutil.rmtree(seg_dir, ignore_errors=True)
            else:
                os.makedirs(trash_root, exist_ok=True)
                dst = os.path.join(
                    trash_root, f"{int(now)}_{uuid.uuid4().hex[:8]}"
                                f"_segment_{sid}")
                os.rename(seg_dir, dst)

        def mutate(doc: dict) -> None:
            remaining = []
            for s in doc["segments"]:
                if (s["status"] in (SegmentStatus.MARKED_FOR_DELETE,
                                    SegmentStatus.COMPACTED)
                        or _stale_iip(s)):
                    if not s.get("external_path"):
                        _dispose(os.path.join(self.table_dir,
                                              f"segment_{s['id']}"), s["id"])
                    cleaned["n"] += 1
                else:
                    remaining.append(s)
            doc["segments"] = remaining
            # physically remove copy-on-write orphans (files dropped from
            # segments by UPDATE/DELETE/MERGE rewrites)
            for rel in doc.pop("orphans", []):
                p = self._abs(rel)
                if os.path.exists(p):
                    os.unlink(p)
                cleaned["n_orphans"] = cleaned.get("n_orphans", 0) + 1
            # merge-on-read delta sidecars not referenced by the
            # CURRENT doc (superseded by horizontal compaction, or
            # crash-orphaned before their manifest commit): time
            # travel is documented as valid only until CLEAN FILES
            live = {os.path.basename(d["path"])
                    for d in doc.get("delete_deltas", [])}
            dd_root = os.path.join(self.table_dir, "deletedelta")
            if os.path.isdir(dd_root):
                for name in os.listdir(dd_root):
                    if name not in live:
                        shutil.rmtree(os.path.join(dd_root, name),
                                      ignore_errors=True)
                        cleaned["n_orphans"] = cleaned.get("n_orphans", 0) + 1
        self.manifest.update(mutate)
        # purge trash past retention (everything, under force)
        if os.path.isdir(trash_root):
            for name in os.listdir(trash_root):
                try:
                    born = float(name.split("_", 1)[0])
                except ValueError:
                    born = 0.0
                if force or now - born > retention_s:
                    shutil.rmtree(os.path.join(trash_root, name),
                                  ignore_errors=True)
        # crash-leftover stats sidecars (committed sidecar, uncommitted
        # JSON) are unreferenced by every version — safe to drop
        self.manifest.gc_stats_sidecars()
        return cleaned["n"]

    # ---------------------------------------------------------- compaction

    def compact(self, kind: str = "minor", segment_ids: list[int] | None = None,
                minor_threshold: int = 4,
                major_size_mb: float | None = None) -> int | None:
        """Compaction (reference CompactionType.java:26-37,
        CarbonTableCompactor.scala). MINOR merges ≥ threshold adjacent
        loads, MAJOR merges all SUCCESS segments below the size cap
        (``major_size_mb`` arg, else table property
        MAJOR_COMPACTION_SIZE, else 1024), CUSTOM merges the given
        ids, HORIZONTAL consolidates merge-on-read delete deltas
        without touching data files (HorizontalCompaction.scala).
        COMPACTION_PRESERVE_SEGMENTS (table property, reference
        carbon.numberof.preserve.segments) shields the N latest
        loads from MINOR/MAJOR. Returns new segment id or None."""
        kind = kind.lower()
        if kind == "horizontal":
            from ..operators.mor import horizontal_compact
            horizontal_compact(self, force=True)
            return None
        from .manifest import retry_on_conflict
        return retry_on_conflict(
            lambda: self._compact_attempt(kind, segment_ids,
                                          minor_threshold, major_size_mb))

    def _compact_attempt(self, kind: str, segment_ids, minor_threshold,
                         major_size_mb) -> int | None:
        # optimistic-concurrency base: the chosen-segment snapshot and
        # the merged data are computed from this version; the commit
        # verifies it so a concurrent IUD (whose delete delta the
        # merged files would silently resurrect) forces a recompute
        base = self.manifest.load(_attach=False)["version"]
        props = self.manifest.properties()
        all_success = self.manifest.segments({SegmentStatus.SUCCESS})
        # auto policies (minor/major) only ever merge NATIVE parquet
        # segments; explicit CUSTOM may name external / non-parquet
        # segments too — the adopt-then-normalize lifecycle (externals
        # enter via ADD SEGMENT, leave compaction as native parquet
        # with full footer stats; CLEAN FILES drops the compacted
        # external entry from the manifest WITHOUT touching its files,
        # which the table never owned)
        segs = [s for s in all_success
                if s.format == "parquet" and not s.external_path]
        preserve = int(props.get("compaction_preserve_segments", 0) or 0)
        if preserve and kind in ("minor", "major") and segs:
            shielded = {s.id for s in sorted(segs, key=lambda s: s.id)
                        [-preserve:]}
            segs = [s for s in segs if s.id not in shielded]
        if kind == "custom":
            chosen = [s for s in all_success
                      if s.id in set(segment_ids or [])]
        elif kind == "major":
            if major_size_mb is None:
                major_size_mb = float(
                    props.get("major_compaction_size", 1024.0))
            cap = major_size_mb * 1024 * 1024
            chosen = [s for s in segs if s.bytes <= cap]
        else:
            chosen = segs if len(segs) >= minor_threshold else []
        if len(chosen) < 2:
            return None
        # read through the aligned path so schema-evolution defaults /
        # renames are MATERIALIZED into the compacted files (the merged
        # segment gets a fresh id, i.e. a post-evolution era), and
        # re-apply the table's FULL load layout — hash bucketing keeps
        # the bucket-map join shuffle-free across compactions, z-order
        # keeps multi-column min/max pruning tight, global/range sort
        # keeps the file ordering (reference compaction preserves the
        # load sort scope, CarbonTableCompactor + sort-scope docs)
        df = self._apply_load_sort(self.read(segments=[s.id for s in chosen]))
        props = self.manifest.properties()
        bucketed = bool(props.get("bucket_columns"))
        tmp = self._write_segment_files(df)
        chosen_ids = {s.id for s in chosen}

        # commit: append merged segment + mark sources COMPACTED, one swap
        data_files = []
        for p in sorted(glob.glob(os.path.join(tmp, "**", "*"), recursive=True)):
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", ".")):
                data_files.append(os.path.relpath(p, tmp))
        new_id = {}

        def mutate(doc: dict) -> None:
            seg_id = self.manifest.next_segment_id(doc)
            seg_dir = os.path.join(self.table_dir, f"segment_{seg_id}")
            os.makedirs(seg_dir, exist_ok=True)
            stats = []
            for rel in data_files:
                dst_rel = os.path.join(f"segment_{seg_id}", rel)
                dst = os.path.join(self.table_dir, dst_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(tmp, rel), dst)
                parts = partition_values_from_relpath(rel)
                if bucketed:
                    b = self._bucket_from_filename(rel)
                    if b is not None:
                        parts["__bucket__"] = b
                stats.append(harvest_file(dst, dst_rel, parts))
            for s in doc["segments"]:
                if s["id"] in chosen_ids:
                    s["status"] = SegmentStatus.COMPACTED
            doc["segments"].append(Segment(
                id=seg_id, status=SegmentStatus.SUCCESS, format="parquet",
                files=stats, load_time=time.time(), source="compact").to_json())
            new_id["id"] = seg_id

        try:
            self.manifest.update(mutate, base_version=base)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        # the merged segment read through read() already excludes
        # merge-on-read deleted rows; delta rows referencing the
        # now-COMPACTED sources are stale — re-trim so count() math
        # and the read-path anti-join stay minimal
        self._trim_deltas()
        return new_id["id"]
