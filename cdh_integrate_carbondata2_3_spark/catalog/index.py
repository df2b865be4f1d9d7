"""Secondary-index + BloomFilter index — query-time file pruning.

Reference parity (SURVEY.md §2.11):
- ``CREATE INDEX ... AS 'carbondata'`` — an SI table of
  (index-col → positionReference) used to pre-prune the main-table
  scan (reference: integration/spark/.../secondaryindex/,
  CarbonSecondaryIndexOptimizer.scala:60-87, docs
  index/secondary-index-guide.md). Ours: a sorted parquet of
  (col..., _file) consulted on equality/IN predicates.
- ``CREATE INDEX ... AS 'bloomfilter'`` — per-blocklet bloom for
  high-cardinality columns (reference: index/bloom/.../
  BloomCoarseGrainIndex.java:70-134, BLOOM_SIZE/BLOOM_FPP). Ours:
  per-FILE bloom sidecars built AND stored executor-side
  (applyInPandas per file → parquet under the index dir); lookups
  read the sidecar with a column filter, and past a row threshold
  membership is evaluated on the executors too (only surviving file
  names reach the driver).
- ``CREATE INDEX ... AS 'lucene'`` — fine-grain full-text index
  answering ``text_match('field:term*')`` (reference: index/lucene/
  .../LuceneFineGrainIndex.java:63-204, docs index/lucene-index-guide
  .md). Ours: a token→file inverted-postings parquet (whitespace
  tokens, matching the RLIKE refinement semantics in sql.py); query
  terms intersect postings to a candidate file set, Spark's RLIKE
  re-evaluates exactly. Scoring/relevance is out of scope, pruning is
  the contract.
- REFRESH INDEX / REINDEX / REGISTER / DROP INDEX / SHOW INDEXES;
  cost-based choice = consult applicable indexes cheapest-first
  (SI < bloom < FTS) and short-circuit once the allow-set stops
  shrinking (reference CarbonCostBasedOptimizer.java:37).

Soundness with stale indexes: each index records the max segment id
it covers (watermark). Files from newer segments are never pruned by
the index — mirroring the reference's REINDEX/repair model where SI
segments must match main-table segments.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import re
import shutil
from typing import Any, Sequence

import pandas as pd
from pyspark.sql import functions as F

from ..plans.pruning import Predicate

_INDEXABLE_OPS = {"=", "in"}


def _dam_le(a: str, b: str, k: int) -> bool:
    """damerau_levenshtein(a, b) <= k (unrestricted Damerau — an
    adjacent transposition costs one edit and transposed characters
    may be edited again). Used by the FuzzyQuery term-dictionary
    expansion: the refine predicate counts transpositions as one edit
    (sql.py _dam_pred_sql, Lucene transpositions=true default), so the
    pruning mask must too — and because damerau <= levenshtein, this
    mask is also a sound superset for 'fuzzy_transpositions'='false'
    tables. Full DP with the last-occurrence table (O(len_a·len_b));
    the dictionary is distinct tokens, so the quadratic cost is per
    dictionary entry, not per corpus row."""
    if abs(len(a) - len(b)) > k:
        return False
    if a == b:
        return True
    inf = len(a) + len(b)
    da: dict[str, int] = {}
    d = [[inf] * (len(b) + 2) for _ in range(len(a) + 2)]
    d[0][0] = inf
    for i in range(len(a) + 1):
        d[i + 1][1] = i
        d[i + 1][0] = inf
    for j in range(len(b) + 1):
        d[1][j + 1] = j
        d[0][j + 1] = inf
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,                       # substitute
                d[i + 1][j] + 1,                      # insert
                d[i][j + 1] + 1,                      # delete
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1))  # transpose
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1] <= k


def _meta_path(table_dir: str, name: str) -> str:
    return os.path.join(table_dir, "_meta", f"index_{name}.json")


def _index_dir(table_dir: str, name: str) -> str:
    return os.path.join(table_dir, "_meta", "indexes", name)


class _Bloom:
    """Simple double-hashing bloom over md5 (deterministic, portable)."""

    def __init__(self, m_bits: int, k: int, bits: bytearray | None = None):
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else bytearray((m_bits + 7) // 8)

    @staticmethod
    def _hashes(value: str) -> tuple[int, int]:
        d = hashlib.md5(value.encode("utf-8")).digest()
        return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1)

    def add(self, value: str) -> None:
        h1, h2 = self._hashes(value)
        for i in range(self.k):
            b = (h1 + i * h2) % self.m
            self.bits[b >> 3] |= 1 << (b & 7)

    def may_contain(self, value: str) -> bool:
        h1, h2 = self._hashes(value)
        for i in range(self.k):
            b = (h1 + i * h2) % self.m
            if not (self.bits[b >> 3] >> (b & 7)) & 1:
                return False
        return True

    def b64(self) -> str:
        return base64.b64encode(bytes(self.bits)).decode()

    @classmethod
    def from_b64(cls, m: int, k: int, s: str) -> "_Bloom":
        return cls(m, k, bytearray(base64.b64decode(s)))


class IndexManager:
    def __init__(self, table):
        self.table = table

    # ------------------------------------------------------------- create

    def create_secondary_index(self, name: str, columns: list[str]) -> None:
        """CREATE INDEX name ON table (columns) AS 'carbondata'."""
        if os.path.exists(_meta_path(self.table.table_dir, name)):
            raise FileExistsError(f"index {name} exists")
        self._build_si(name, columns)

    def create_bloom_index(self, name: str, columns: list[str],
                           m_bits: int = 64 * 1024 * 8, k: int = 5) -> None:
        """CREATE INDEX name ON table (columns) AS 'bloomfilter'."""
        if os.path.exists(_meta_path(self.table.table_dir, name)):
            raise FileExistsError(f"index {name} exists")
        self._build_bloom(name, columns, m_bits, k)

    def create_fts_index(self, name: str, columns: list[str],
                         analyzer: str = "whitespace",
                         fuzzy_transpositions: bool = True,
                         dict_fastpath: bool = True,
                         dict_fastpath_max: int = 2000) -> None:
        """CREATE INDEX name ON table (columns) AS 'lucene'
        [PROPERTIES('analyzer'='standard'|'english'|'porter',
        'fuzzy_transpositions'='false')]. ``whitespace``
        = case-sensitive whitespace tokens (round-3 behavior);
        ``standard`` = lowercase + whitespace, the practical core of
        Lucene's StandardAnalyzer; ``english`` = lowercase + the
        classic 33-word stop set + minimal s-stemmer
        (functions/analyzers.py — Lucene EnglishAnalyzer's pipeline
        with the SQL-expressible stemmer, full oracle parity);
        ``porter`` = lowercase + stop set + the full Porter stemmer
        (functions/porter.py — Lucene PorterStemFilter; refine runs
        through an Arrow-batched UDF since Porter's measure conditions
        have no SQL form, and term queries only).
        ``fuzzy_transpositions=False`` compiles
        term~N queries on this table with plain Levenshtein instead of
        the Damerau default (Lucene FuzzyQuery transpositions=true).
        Reference lucene-index-guide.md."""
        if os.path.exists(_meta_path(self.table.table_dir, name)):
            raise FileExistsError(f"index {name} exists")
        if analyzer not in ("whitespace", "standard", "english",
                            "porter"):
            raise ValueError(f"unsupported analyzer {analyzer!r} "
                             "(whitespace | standard | english | porter)")
        self._build_fts(name, columns, analyzer,
                        fuzzy_transpositions=fuzzy_transpositions,
                        dict_fastpath=dict_fastpath,
                        dict_fastpath_max=dict_fastpath_max)

    def refresh(self, name: str) -> None:
        """REFRESH INDEX — rebuild to cover all current segments."""
        meta = self._load_meta(name)
        if meta["type"] == "si":
            self._build_si(name, meta["columns"])
        elif meta["type"] == "fts":
            self._build_fts(name, meta["columns"],
                            meta.get("analyzer", "whitespace"),
                            fuzzy_transpositions=meta.get(
                                "fuzzy_transpositions", True),
                            dict_fastpath=meta.get("dict_fastpath", True),
                            dict_fastpath_max=meta.get(
                                "dict_fastpath_max", 2000))
        else:
            self._build_bloom(name, meta["columns"], meta["m_bits"], meta["k"])

    def repair(self, name: str | None = None) -> list[str]:
        """REINDEX [INDEX TABLE name] ON table — rebuild stale indexes
        (watermark below the newest segment). Returns rebuilt names."""
        wm = self._watermark()
        rebuilt = []
        for m in self.show():
            if name is not None and m["name"] != name:
                continue
            if m["watermark_segment"] < wm:
                self.refresh(m["name"])
                rebuilt.append(m["name"])
        return rebuilt

    def drop(self, name: str) -> None:
        p = _meta_path(self.table.table_dir, name)
        if os.path.exists(p):
            os.unlink(p)
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(idx_dir + "__dict", ignore_errors=True)

    def show(self) -> list[dict]:
        out = []
        meta_dir = os.path.join(self.table.table_dir, "_meta")
        for f in sorted(os.listdir(meta_dir)):
            if f.startswith("index_") and f.endswith(".json"):
                with open(os.path.join(meta_dir, f)) as fh:
                    m = json.load(fh)
                row = {k: m[k] for k in ("name", "type", "columns",
                                         "watermark_segment")}
                for k in ("analyzer", "fuzzy_transpositions",
                          "dict_fastpath", "dict_fastpath_max"):
                    if k in m:
                        row[k] = m[k]
                out.append(row)
        return out

    # ------------------------------------------------- porter fast path

    def porter_dict(self, meta: dict) -> tuple[frozenset, dict] | None:
        """(covered columns, surface→stem mapping) for a FRESH porter
        index whose vocabulary fits dict_fastpath_max, else None. The
        freshness test (watermark == newest segment) is the same
        envelope candidate_files uses: new data always lands in a
        higher segment id, so an equal watermark means every surface
        token in the table is in the dictionary and the JVM-side map
        lookup is exactly the Porter stemmer on this corpus."""
        if meta.get("analyzer") != "porter":
            return None
        if meta.get("dict_fastpath", True) is False:
            return None
        if meta["watermark_segment"] != self._watermark():
            return None
        ddir = _index_dir(self.table.table_dir, meta["name"]) + "__dict"
        if not os.path.isdir(ddir):
            return None
        import pyarrow.parquet as pq
        parts = [os.path.join(ddir, f) for f in os.listdir(ddir)
                 if f.endswith(".parquet")]
        if not parts:
            return None
        cap = int(meta.get("dict_fastpath_max", 2000))
        if sum(pq.read_metadata(p).num_rows for p in parts) > cap:
            return None
        t = pq.read_table(ddir, columns=["surf", "stem"])
        mapping = dict(zip(t.column("surf").to_pylist(),
                           t.column("stem").to_pylist()))
        return frozenset(meta["columns"]), mapping

    # -------------------------------------------------------------- build

    def _watermark(self) -> int:
        segs = self.table.manifest.queryable_segments()
        return max((s.id for s in segs), default=-1)

    def _covered_files(self, watermark: int) -> set[str]:
        return {f.path for s in self.table.manifest.queryable_segments()
                if s.id <= watermark for f in s.files}

    def _build_si(self, name: str, columns: list[str]) -> None:
        wm = self._watermark()
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)
        from ..operators.dml import read_with_file
        df = (read_with_file(self.table)
              .select(*columns, "_file").distinct()
              .withColumn("_file", F.expr(
                  "replace(_file, 'file://', '')")))
        # sorted by index columns → min/max row-group pruning inside the
        # SI itself (the reference sorts SI tables the same way)
        df.sort(*columns).coalesce(1).write.mode("overwrite").parquet(idx_dir)
        self._save_meta({"name": name, "type": "si", "columns": columns,
                         "watermark_segment": wm})

    def _build_fts(self, name: str, columns: list[str],
                   analyzer: str = "whitespace",
                   fuzzy_transpositions: bool = True,
                   dict_fastpath: bool = True,
                   dict_fastpath_max: int = 2000) -> None:
        """Token→file inverted postings: whitespace tokens (the same
        tokenization the text_match RLIKE refinement uses; lowercased
        first under the 'standard' analyzer), distinct per file, sorted
        by (col, tok) so the postings parquet itself prunes by
        row-group min/max on lookup.

        Under 'porter' a SURFACE→STEM dictionary sidecar
        (``<idx>__dict``) is also written: the distinct (col, surface
        token, stem) triples the stem UDF computed anyway during the
        build. When the vocabulary is small (<= dict_fastpath_max)
        and the index covers every segment, text_match compiles
        porter predicates as a JVM-side map lookup over this
        dictionary instead of the Arrow UDF (sql.py _porter_fast) —
        the same dictionary-expansion trick fuzzy terms already use
        for pruning."""
        wm = self._watermark()
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(idx_dir + "__dict", ignore_errors=True)
        from ..operators.dml import read_with_file
        base = read_with_file(self.table).withColumn(
            "_file", F.expr("replace(_file, 'file://', '')"))
        posts, dicts, cached = None, None, []
        for col in columns:
            src = F.col(col).cast("string")
            if analyzer in ("standard", "english", "porter"):
                src = F.lower(src)
            p = (base.select(
                    F.lit(col).alias("col"),
                    F.explode(F.split(src, r"\s+")).alias("tok"),
                    "_file")
                 .filter(F.col("tok") != ""))
            if analyzer == "english":
                # stop-remove on the surface form, then stem — the
                # same order the refine predicate and oracle use
                # (functions/analyzers.py); stays JVM-side via expr
                from ..functions.analyzers import (ENGLISH_STOPWORDS,
                                                   stem_sql)
                p = (p.filter(~F.col("tok").isin(*ENGLISH_STOPWORDS))
                     .withColumn("tok", F.expr(stem_sql("tok"))))
            elif analyzer == "porter":
                # full Porter has no SQL form (measure conditions) —
                # Arrow-batched pandas UDF over the exploded tokens;
                # the build is a one-time cost per REINDEX. The
                # distinct (surface, stem) pairs are cached so the
                # dict sidecar rides the same UDF pass as the postings
                from ..functions.analyzers import ENGLISH_STOPWORDS
                from ..functions.porter import porter_stem

                @F.pandas_udf("string")
                def _pstem(toks: pd.Series) -> pd.Series:
                    return toks.map(porter_stem)

                p = (p.filter(~F.col("tok").isin(*ENGLISH_STOPWORDS))
                     .withColumn("stem", _pstem("tok"))
                     .select("col", F.col("tok").alias("surf"),
                             "stem", "_file")
                     .distinct().cache())
                cached.append(p)
                d = p.select("col", "surf", "stem").distinct()
                dicts = d if dicts is None else dicts.unionByName(d)
                p = p.select("col", F.col("stem").alias("tok"), "_file")
            posts = p if posts is None else posts.unionByName(p)
        (posts.distinct().sort("col", "tok")
         .coalesce(1).write.mode("overwrite").parquet(idx_dir))
        if dicts is not None:
            (dicts.sort("col", "surf")
             .coalesce(1).write.mode("overwrite").parquet(idx_dir + "__dict"))
        for c in cached:
            c.unpersist()
        meta = {"name": name, "type": "fts", "columns": columns,
                "analyzer": analyzer, "watermark_segment": wm}
        if not fuzzy_transpositions:
            meta["fuzzy_transpositions"] = False
        if analyzer == "porter":
            meta["dict_fastpath"] = bool(dict_fastpath)
            meta["dict_fastpath_max"] = int(dict_fastpath_max)
        self._save_meta(meta)

    def _build_bloom(self, name: str, columns: list[str],
                     m_bits: int, k: int) -> None:
        """Per-file bloom sidecars written EXECUTOR-side as a parquet of
        (file, col, bloom-b64) under the index dir; the meta JSON keeps
        only the pointer + params. At 100k-file scale nothing funnels
        through the driver at build time, and lookups read the sidecar
        with a column-predicate pushdown instead of deserializing one
        giant JSON blob on every plan."""
        wm = self._watermark()
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)

        def build(pdf):
            import pandas as pd
            fname = pdf["_file"].iloc[0].replace("file://", "")
            out = []
            for col in columns:
                b = _Bloom(m_bits, k)
                for v in pdf[col].dropna().unique():
                    b.add(str(v))
                out.append((fname, col, b.b64()))
            return pd.DataFrame(out, columns=["file", "col", "bloom"])

        from ..operators.dml import read_with_file
        (read_with_file(self.table)
         .select(*columns, "_file")
         .groupBy("_file")
         .applyInPandas(build, "file string, col string, bloom string")
         .write.mode("overwrite").parquet(idx_dir))
        self._save_meta({"name": name, "type": "bloom", "columns": columns,
                         "m_bits": m_bits, "k": k,
                         "watermark_segment": wm})

    def _save_meta(self, meta: dict) -> None:
        p = _meta_path(self.table.table_dir, meta["name"])
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, p)

    def _load_meta(self, name: str) -> dict:
        with open(_meta_path(self.table.table_dir, name)) as f:
            return json.load(f)

    # -------------------------------------------------------------- prune

    # cost order for index consultation (reference
    # CarbonCostBasedOptimizer.java:37 picks the cheapest covering
    # index): SI is an exact sorted lookup with row-group pruning,
    # bloom must touch every file's bitset, FTS scans postings.
    _TYPE_COST = {"si": 0, "bloom": 1, "fts": 2}

    def candidate_files(self, predicates: Sequence[Predicate] | None
                        ) -> set[str] | None:
        """Intersected allow-set of ABS file paths, or None if no index
        applies. Files above an index's watermark are always allowed.

        Per PREDICATE, only the single cheapest covering index is
        consulted (an SI on a column makes a bloom on the same column
        dead weight — the reference picks one index, not all); the
        per-predicate results intersect, stopping early once the set is
        empty. ``self.last_consulted`` records which indexes ran."""
        self.last_consulted: list[str] = []
        if not predicates:
            return None
        # cheapest covering index per predicate position
        best: dict[int, tuple] = {}
        for meta in map(self._load_meta, [m["name"] for m in self.show()]):
            if meta["type"] not in self._TYPE_COST:
                continue                  # e.g. ivf — not a file pruner
            for pi, (col, op, value) in enumerate(predicates):
                if col not in meta["columns"]:
                    continue
                if meta["type"] == "fts":
                    if op not in ("text_match", "text_match_any"):
                        continue
                elif op not in _INDEXABLE_OPS:
                    continue
                cost = (self._TYPE_COST[meta["type"]], len(meta["columns"]))
                cur = best.get(pi)
                if cur is None or cost < cur[0]:
                    best[pi] = (cost, meta, col, op, value)
        allowed: set[str] | None = None
        for _, meta, col, op, value in sorted(best.values(),
                                              key=lambda j: j[0]):
            if allowed is not None and not allowed:
                break
            if meta["type"] == "fts":
                files = self._fts_lookup(
                    meta, col, list(value),
                    mode="any" if op == "text_match_any" else "all")
            else:
                values = [value] if op == "=" else list(value)
                if meta["type"] == "si":
                    files = self._si_lookup(meta, col, values)
                else:
                    files = self._bloom_lookup(meta, col, values)
            self.last_consulted.append(meta["name"])
            above_wm = {
                self.table._abs(f.path)
                for s in self.table.manifest.queryable_segments()
                if s.id > meta["watermark_segment"] for f in s.files}
            files |= above_wm
            allowed = files if allowed is None else (allowed & files)
        return allowed

    def _si_lookup(self, meta: dict, col: str, values: list[Any]) -> set[str]:
        import pyarrow.parquet as pq
        idx_dir = _index_dir(self.table.table_dir, meta["name"])
        t = pq.read_table(idx_dir, columns=[col, "_file"],
                          filters=[(col, "in", values)])
        return {os.path.abspath(p) for p in t.column("_file").to_pylist()}

    def _fts_lookup(self, meta: dict, col: str, terms: list[str],
                    mode: str = "all") -> set[str]:
        """Postings lookup. ``mode="all"`` (conjunctive text_match):
        files that may contain ALL the given terms — per-term postings
        intersect. ``mode="any"`` (disjunctive): files that may match
        ANY term — per-term sets union (sound for OR: every matching
        row matches some branch, whose file is in that branch's set).
        A term containing spaces is a quoted PHRASE: its file set is
        the intersection of its tokens' postings (a row matching the
        phrase contains every token). A trailing ``*`` is a prefix
        wildcard; ``?`` terms are not prunable and act as
        match-anything (in "any" mode that makes the whole lookup
        unprunable). A ``term~N`` token is FUZZY: it expands against
        the distinct-token dictionary (Damerau <= N) and unions the
        matched tokens' postings — Lucene FuzzyQuery's automaton walk,
        done driver-side over the (small) dictionary."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        idx_dir = _index_dir(self.table.table_dir, meta["name"])
        t = pq.read_table(idx_dir, columns=["tok", "_file"],
                          filters=[("col", "=", col)])
        analyzer = meta.get("analyzer")
        if analyzer in ("standard", "english", "porter"):
            # postings are lowercased — normalize query terms the same
            # way (wildcard/fuzzy markers are ASCII and survive lower())
            terms = [tm.lower() for tm in terms]
        if analyzer in ("english", "porter"):
            # postings are stop-filtered + stemmed: stem each PLAIN
            # token the same way (wildcard/fuzzy patterns are matched
            # against the stemmed dictionary as-is — Lucene evaluates
            # multi-term queries against index terms un-analyzed);
            # a stopword token was DROPPED from the compiled query
            # (sql.py _term_sql), so it must impose no constraint here
            from ..functions.analyzers import is_stopword
            if analyzer == "porter":
                from ..functions.porter import porter_analyze as analyze_term
            else:
                from ..functions.analyzers import analyze_term

            def _norm(term: str) -> str:
                out = []
                for tk in term.split():
                    if re.fullmatch(r"(.+)~(\d)", tk) or "*" in tk \
                            or "?" in tk:
                        out.append(tk)
                    elif not is_stopword(tk):
                        out.append(analyze_term(tk))
                return " ".join(out)
            terms = [t for t in (_norm(tm) for tm in terms) if t]

        def _all_files() -> set[str]:
            return {os.path.abspath(self.table._abs(f.path))
                    for s in self.table.manifest.queryable_segments()
                    for f in s.files}

        def _fuzzy_mask(base: str, edits: int):
            """Lucene-FuzzyQuery-style term-dictionary expansion: mark
            every distinct indexed token within ``edits`` Damerau
            edits of ``base`` (length-band prefilter, then a bounded DP
            driver-side — the dictionary is distinct tokens, orders of
            magnitude smaller than the corpus). Returns a boolean mask
            over ``t``, or None if the dictionary is too large to
            expand cheaply (→ unprunable, scan refines exactly)."""
            toks = t.column("tok")
            lens = pc.utf8_length(toks)
            band = pc.and_(pc.greater_equal(lens, len(base) - edits),
                           pc.less_equal(lens, len(base) + edits))
            cand = pc.unique(toks.filter(band)).to_pylist()
            if len(cand) > 200_000:
                return None
            matched = [c for c in cand if _dam_le(base, c, edits)]
            if not matched:
                return pc.equal(toks, "\x00")   # matches nothing
            return pc.is_in(toks, value_set=pa.array(matched))

        def _term_files(term: str) -> set[str] | None:
            """Files that may match one term (phrase-aware); None =
            unprunable, no constraint."""
            acc: set[str] | None = None
            for tk in term.split():
                if "?" in tk or (tk.count("*") - tk.endswith("*")) > 0:
                    continue            # wildcard token → no constraint
                if fm := re.fullmatch(r"(.+)~(\d)", tk):
                    mask = _fuzzy_mask(fm.group(1), int(fm.group(2)))
                    if mask is None:
                        continue        # dictionary too big → no constraint
                elif tk.endswith("*"):
                    mask = pc.starts_with(t.column("tok"), tk[:-1])
                else:
                    mask = pc.equal(t.column("tok"), tk)
                files = {os.path.abspath(p)
                         for p in t.filter(mask).column("_file").to_pylist()}
                acc = files if acc is None else (acc & files)
            return acc

        if mode == "any":
            out: set[str] = set()
            for term in terms:
                tf = _term_files(term)
                if tf is None:          # one unprunable branch → all
                    return _all_files()
                out |= tf
            return out
        allowed: set[str] | None = None
        for term in terms:
            tf = _term_files(term)
            if tf is None:
                continue
            allowed = tf if allowed is None else (allowed & tf)
        return allowed if allowed is not None else _all_files()

    # above this many sidecar rows, evaluate membership on the executors
    # (driver reads only the surviving file names, not every bitset)
    _BLOOM_DISTRIBUTED_ROWS = 20_000

    def _bloom_lookup(self, meta: dict, col: str, values: list[Any]) -> set[str]:
        import pyarrow.parquet as pq
        idx_dir = _index_dir(self.table.table_dir, meta["name"])
        m_bits, k = meta["m_bits"], meta["k"]
        svals = [str(v) for v in values]
        ds = pq.ParquetDataset(idx_dir, filters=[("col", "=", col)])
        n_rows = sum(fr.metadata.num_rows for fr in ds.fragments)
        if n_rows >= self._BLOOM_DISTRIBUTED_ROWS:
            @F.pandas_udf("boolean")
            def may_contain(blooms):
                import pandas as pd
                return pd.Series([
                    any(_Bloom.from_b64(m_bits, k, s).may_contain(v)
                        for v in svals)
                    for s in blooms])
            rows = (self.table.spark.read.parquet(idx_dir)
                    .filter(F.col("col") == col)
                    .filter(may_contain(F.col("bloom")))
                    .select("file").collect())
            return {os.path.abspath(r["file"]) for r in rows}
        t = ds.read(columns=["file", "bloom"])
        out = set()
        for fname, b64 in zip(t.column("file").to_pylist(),
                              t.column("bloom").to_pylist()):
            b = _Bloom.from_b64(m_bits, k, b64)
            if any(b.may_contain(v) for v in svals):
                out.add(os.path.abspath(fname))
        return out
