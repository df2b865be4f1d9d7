"""Parquet footer stats harvesting for the manifest.

Row counts and per-column min/max come from parquet footers (no data
scan) — the same information the reference persists in its blocklet
min/max indexes (format/src/main/thrift/carbondata.thrift:37-54
BlockletMinMaxIndex), kept here at file granularity. Finer-grained
(row-group) skipping inside a chosen file is Spark's builtin job.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

import pyarrow.parquet as pq

from .manifest import FileStat

# stats are only kept for orderable primitive types
_STATTABLE = {"INT32", "INT64", "FLOAT", "DOUBLE", "BYTE_ARRAY", "INT96"}


def _norm(v: Any) -> Any:
    """JSON-comparable normalization: timestamps/dates → ISO strings
    (lexicographically ordered), bytes → utf8 str, numbers unchanged."""
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):      # date has no sep kwarg
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)):
        return v
    return None


def harvest_file(abs_path: str, rel_path: str,
                 partition: dict[str, str] | None = None) -> FileStat:
    pf = pq.ParquetFile(abs_path)
    md = pf.metadata
    minmax: dict[str, list[Any]] = {}
    ok: dict[str, bool] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:          # nested — skip
                continue
            try:
                st = col.statistics
                if st is None or not st.has_min_max:
                    ok[name] = False
                    continue
                mn, mx = _norm(st.min), _norm(st.max)
            except NotImplementedError:
                # pyarrow can't decode stats for some logical types
                # (e.g. decimal) — the file just loses its min/max prune
                ok[name] = False
                continue
            if mn is None or mx is None:
                ok[name] = False
                continue
            if name not in minmax:
                minmax[name] = [mn, mx]
                ok.setdefault(name, True)
            else:
                cur = minmax[name]
                cur[0] = min(cur[0], mn)
                cur[1] = max(cur[1], mx)
    minmax = {k: v for k, v in minmax.items() if ok.get(k, False)}
    return FileStat(path=rel_path, rows=md.num_rows,
                    bytes=os.path.getsize(abs_path), minmax=minmax,
                    partition=partition or {})


def partition_values_from_relpath(rel_path: str) -> dict[str, str]:
    """Hive-style key=value directories → partition dict."""
    parts: dict[str, str] = {}
    for comp in rel_path.split(os.sep)[:-1]:
        if "=" in comp:
            k, _, v = comp.partition("=")
            parts[k] = v
    return parts


def harvest_orc_footer(abs_path: str, rel_path: str,
                       partition: dict[str, str] | None = None
                       ) -> FileStat:
    """Exact row count from the ORC footer — zero data scan, the ORC
    analogue of the parquet harvest (reference MixedFormatHandler
    prunes ORC externals via their own footers,
    MixedFormatHandler.scala:55-230). pyarrow's ORC reader does not
    expose column statistics, so min/max needs the opt-in
    ``stats='scan'`` path (:func:`harvest_scan`); the footer count
    alone already restores metadata-only COUNT(*) on mixed tables."""
    from pyarrow import orc
    f = orc.ORCFile(abs_path)
    return FileStat(path=rel_path, rows=int(f.nrows),
                    bytes=os.path.getsize(abs_path), minmax={},
                    partition=partition or {})


def harvest_scan(abs_path: str, rel_path: str, fmt: str,
                 partition: dict[str, str] | None = None) -> FileStat:
    """One-time LOCAL stats scan for formats whose footers carry no
    min/max (orc via pyarrow, csv, line-delimited json): exact row
    count plus per-column min/max for orderable primitive columns.
    Opt-in at ADD SEGMENT (``stats='scan'``) because it reads the
    file once — the same cost the reference pays harvesting stats at
    LOAD; the default ADD SEGMENT stays O(1) metadata-only.

    Only columns whose pyarrow-inferred type is integer/floating/
    string/date/timestamp keep stats (matching the parquet harvest's
    orderable-primitive restriction); anything else — or a type the
    engine's csv/json reader might infer differently — simply loses
    its file-skip, which is sound (pruning treats absent stats as
    "may match")."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if fmt == "orc":
        from pyarrow import orc
        tbl = orc.ORCFile(abs_path).read()
    elif fmt == "csv":
        from pyarrow import csv as pa_csv
        tbl = pa_csv.read_csv(abs_path)
    elif fmt == "json":
        from pyarrow import json as pa_json
        tbl = pa_json.read_json(abs_path)
    else:
        raise ValueError(f"harvest_scan: unsupported format {fmt!r}")
    minmax: dict[str, list[Any]] = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        t = col.type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_date(t) or pa.types.is_timestamp(t)):
            continue
        if col.null_count == len(col) or len(col) == 0:
            continue
        mm = pc.min_max(col)
        mn, mx = _norm(mm["min"].as_py()), _norm(mm["max"].as_py())
        if mn is None or mx is None:
            continue
        minmax[name] = [mn, mx]
    return FileStat(path=rel_path, rows=int(tbl.num_rows),
                    bytes=os.path.getsize(abs_path), minmax=minmax,
                    partition=partition or {})
