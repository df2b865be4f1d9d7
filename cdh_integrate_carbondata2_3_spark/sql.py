"""Extended-SQL entry point — the engine's CarbonExtensions.

The reference injects its own parser ahead of Spark's
(CarbonExtensionSqlParser.scala:33-42: try carbon parser, fall through
to Spark). Ours is the same shape in Python: a regex pre-parser
dispatches the extended command surface (parser grammar:
CarbonSpark2SqlParser.scala — UPDATE :259-300, DELETE :239-257,
segment mgmt :507-611, CREATE INDEX :192-231, streams :154-183,
LOAD :493-505) to the engine's command layer; anything unrecognized
runs as plain ``spark.sql`` over the catalog's tables registered as
views, after the MV-rewrite and metadata-count(*) fast paths
(MVRewriteRule.scala:40-123, CarbonCountStar.scala:44-108).
"""

from __future__ import annotations

import base64
import json
import os
import re
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog.table import Table
from .mv.manager import AggSpec, MVManager, QuerySpec
from .operators import dml, merge as merge_ops
from .plans.pruning import parse_simple_condition
from .streaming.streams import StreamManager, finish_streaming


def _ci(pattern: str) -> re.Pattern:
    return re.compile(pattern, re.IGNORECASE | re.DOTALL)


_CREATE_TABLE = _ci(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?((?:\w+\.)?\w+)\s*\((.*?)\)\s*"
    r"(?:USING\s+\w+\s*)?(?:TBLPROPERTIES\s*\((.*?)\))?\s*$")
_CTAS = _ci(r"^\s*CREATE\s+TABLE\s+((?:\w+\.)?\w+)\s+AS\s+(SELECT\b.*)$")
_CREATE_LIKE = _ci(r"^\s*CREATE\s+TABLE\s+((?:\w+\.)?\w+)\s+LIKE\s+"
                   r"((?:\w+\.)?\w+)\s*$")
_DROP_TABLE = _ci(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?((?:\w+\.)?\w+)\s*$")
_LOAD_DATA = _ci(
    r"^\s*LOAD\s+DATA\s+(?:LOCAL\s+)?INPATH\s+'([^']+)'\s+"
    r"(OVERWRITE\s+)?INTO\s+TABLE\s+((?:\w+\.)?\w+)\s*(?:OPTIONS\s*\((.*?)\))?\s*$")
_INSERT = _ci(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s+(SELECT\b.*)$")
# INSERT INTO t STAGE / DELETE FROM TABLE t STAGE — commit / GC stage
# files dropped by external SDK writers (reference
# CarbonSpark2SqlParser.scala:531-564, CarbonInsertFromStageCommand)
_INSERT_STAGE = _ci(
    r"^\s*INSERT\s+INTO\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s+STAGE\s*"
    r"(?:OPTIONS\s*\((.*?)\))?\s*$")
_DELETE_STAGE = _ci(
    r"^\s*DELETE\s+FROM\s+TABLE\s+((?:\w+\.)?\w+)\s+STAGE\s*"
    r"(?:OPTIONS\s*\((.*?)\))?\s*$")
_UPDATE_TUPLE = _ci(
    r"^\s*UPDATE\s+((?:\w+\.)?\w+)\s+SET\s*\(([^)]+)\)\s*=\s*\((.*?)\)\s*"
    r"(?:WHERE\s+(.*?))?\s*$")
_UPDATE_PLAIN = _ci(
    r"^\s*UPDATE\s+((?:\w+\.)?\w+)\s+SET\s+(.*?)\s*(?:WHERE\s+(.*?))?\s*$")
_DELETE_SEGMENT_ID = _ci(
    r"^\s*DELETE\s+FROM\s+TABLE\s+((?:\w+\.)?\w+)\s+WHERE\s+SEGMENT\.ID\s+IN\s*"
    r"\(([\d\s,]+)\)\s*$")
_DELETE_SEGMENT_DATE = _ci(
    r"^\s*DELETE\s+FROM\s+TABLE\s+((?:\w+\.)?\w+)\s+WHERE\s+SEGMENT\.STARTTIME\s+"
    r"BEFORE\s+'([^']+)'\s*$")
_DELETE = _ci(r"^\s*DELETE\s+FROM\s+((?:\w+\.)?\w+)\s*(?:WHERE\s+(.*?))?\s*$")
# SET carbon.input.segments.[db.]t = ids|* — session-scoped segment
# reads for subsequent queries (docs segment-management:162-183)
_SET_INPUT_SEGMENTS = _ci(
    r"^\s*SET\s+carbon\.input\.segments\.((?:\w+\.)?\w+)\s*=\s*"
    r"(\*|[\d,\s]+)\s*$")
# SHOW [HISTORY] SEGMENTS ON t [LIMIT n] [AS SELECT ... FROM t_segments]
# (reference CarbonShowSegmentsCommand / CarbonShowSegmentsAsSelectCommand,
#  docs segment-management-on-carbondata.md:54-104)
_SHOW_SEGMENTS_AS = _ci(
    r"^\s*SHOW\s+SEGMENTS\s+(?:FOR|ON)\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*"
    r"(?:LIMIT\s+(\d+)\s+)?AS\s+(SELECT\b.*)$")
_SHOW_HISTORY_SEGMENTS = _ci(
    r"^\s*SHOW\s+HISTORY\s+SEGMENTS\s+(?:FOR|ON)\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
_SHOW_SEGMENTS = _ci(
    r"^\s*SHOW\s+SEGMENTS\s+(?:FOR|ON)\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*"
    r"(?:LIMIT\s+(\d+))?\s*$")
_CLEAN_FILES = _ci(r"^\s*CLEAN\s+FILES\s+FOR\s+TABLE\s+((?:\w+\.)?\w+)"
                   r"(?:\s+OPTIONS\s*\((.*?)\))?\s*$")
_ALTER_COMPACT = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+COMPACT\s+'(\w+)'\s*"
    r"(?:WHERE\s+SEGMENT\.ID\s+IN\s*\(([\d\s,]+)\))?\s*$")
# ALTER TABLE t ADD SEGMENT OPTIONS('path'='...','format'='...'
# [,'stats'='scan']) — reference CarbonAddLoadCommand.scala:66-117
_ALTER_ADD_SEGMENT = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+ADD\s+SEGMENT\s+"
    r"OPTIONS\s*\((.*?)\)\s*$")
_ALTER_ADD_COLS = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+ADD\s+COLUMNS\s*\((.*?)\)\s*"
    r"(?:TBLPROPERTIES\s*\((.*?)\))?\s*$")
_ALTER_DROP_COLS = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+DROP\s+COLUMNS\s*\((.*?)\)\s*$")
_ALTER_CHANGE = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+CHANGE\s+(\w+)\s+(\w+)\s+([\w(),\s]+?)\s*$")
_ALTER_FINISH_STREAMING = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+FINISH\s+STREAMING\s*$")
# SET/UNSET TBLPROPERTIES, RENAME TO, SHOW CREATE TABLE (reference
# CarbonAlterTableSetCommand / CarbonAlterTableUnsetCommand /
# CarbonAlterTableRenameCommand / CarbonShowCreateTableCommand)
_ALTER_SET_PROPS = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+SET\s+TBLPROPERTIES\s*\((.*?)\)\s*$")
_ALTER_UNSET_PROPS = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+UNSET\s+TBLPROPERTIES\s*\((.*?)\)\s*$")
_ALTER_RENAME_TABLE = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+RENAME\s+TO\s+((?:\w+\.)?\w+)\s*$")
_SHOW_CREATE_TABLE = _ci(r"^\s*SHOW\s+CREATE\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_TRUNCATE = _ci(r"^\s*TRUNCATE\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_ADD_PARTITION = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+ADD\s+PARTITION\s*\((.*?)\)\s+"
    r"LOCATION\s+'([^']+)'\s*$")
_DROP_PARTITION = _ci(
    r"^\s*ALTER\s+TABLE\s+((?:\w+\.)?\w+)\s+DROP\s+PARTITION\s*\((.*?)\)\s*$")
_SHOW_PARTITIONS = _ci(r"^\s*SHOW\s+PARTITIONS\s+((?:\w+\.)?\w+)\s*$")


def _parse_part_spec(s: str) -> dict[str, str]:
    spec = {}
    for kv in s.split(","):
        k, _, v = kv.partition("=")
        spec[k.strip()] = v.strip().strip("'\"")
    return spec
_CREATE_INDEX = _ci(
    r"^\s*CREATE\s+INDEX\s+(\w+)\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*\(([^)]+)\)\s+"
    r"AS\s+'(\w+)'\s*(?:PROPERTIES\s*\((.*?)\))?\s*$")
_DROP_INDEX = _ci(
    r"^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?(\w+)\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
_SHOW_INDEXES = _ci(r"^\s*SHOW\s+INDEXES\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
# REINDEX [INDEX TABLE name] ON table / REGISTER INDEX TABLE name ON table
# (reference CarbonSpark2SqlParser.scala:750-780)
_REINDEX = _ci(
    r"^\s*REINDEX(?:\s+INDEX\s+TABLE\s+((?:\w+\.)?\w+))?\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
_REGISTER_INDEX = _ci(
    r"^\s*REGISTER\s+INDEX\s+TABLE\s+((?:\w+\.)?\w+)\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
_CREATE_MV = _ci(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s*"
    r"(WITH\s+DEFERRED\s+REFRESH\s+)?AS\s+(SELECT\b.*)$")
_REFRESH_MV = _ci(r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_DROP_MV = _ci(r"^\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_SHOW_MV = _ci(r"^\s*SHOW\s+MATERIALIZED\s+VIEWS\s+ON\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_CREATE_STREAM = _ci(
    r"^\s*CREATE\s+STREAM\s+(\w+)\s+ON\s+TABLE\s+((?:\w+\.)?\w+)\s+"
    r"STMPROPERTIES\s*\((.*?)\)\s*(?:AS\s+(SELECT\b.*))?$")
_DROP_STREAM = _ci(r"^\s*DROP\s+STREAM\s+(\w+)\s*$")
_SHOW_STREAMS = _ci(r"^\s*SHOW\s+STREAMS\s*$")
_MERGE = _ci(
    r"^\s*MERGE\s+INTO\s+((?:\w+\.)?\w+)(?:\s+(?:AS\s+)?(\w+))?\s+"
    r"USING\s+((?:\w+\.)?\w+)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.+?)\s+(WHEN\s+.*)$")
_MERGE_WHEN = _ci(
    r"WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.+?))?\s*THEN\s+(.+?)\s*"
    r"(?=WHEN\s+(?:NOT\s+)?MATCHED|$)")
_SHOW_TABLES = _ci(r"^\s*SHOW\s+TABLES\s*(?:IN\s+(\w+))?\s*$")
# database DDL + session database (reference: every CarbonSpark2Sql
# production carries an optional db qualifier — ontable :233-237,
# table :412-417 — resolved through CarbonEnv's current database)
_CREATE_DATABASE = _ci(
    r"^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*$")
_DROP_DATABASE = _ci(
    r"^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?(\w+)"
    r"\s*(CASCADE)?\s*$")
_USE_DB = _ci(r"^\s*USE\s+(\w+)\s*$")
_SHOW_DATABASES = _ci(r"^\s*SHOW\s+(?:DATABASES|SCHEMAS)\s*$")
# db-qualified table reference in a TABLE POSITION of passthrough SQL
# (after FROM/JOIN/INTO/TABLE/UPDATE/USING) — never alias.column
_QUAL_REF = _ci(r"\b(FROM|JOIN|INTO|TABLE|UPDATE|USING)\s+(\w+)\.(\w+)")
_REFRESH_TABLE = _ci(r"^\s*REFRESH\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_SHOW_METACACHE = _ci(r"^\s*SHOW\s+METACACHE(?:\s+ON\s+TABLE\s+((?:\w+\.)?\w+))?\s*$")
_DROP_METACACHE = _ci(r"^\s*DROP\s+METACACHE\s+ON\s+TABLE\s+((?:\w+\.)?\w+)\s*$")
_EXPLAIN = _ci(r"^\s*EXPLAIN\s+(SELECT\b.*)$")
# EXPLAIN for engine DML/commands (reference CarbonExplainCommand
# explains commands too, with ExplainCollector pruning info)
_EXPLAIN_ANY = _ci(r"^\s*EXPLAIN\s+((?:UPDATE|DELETE|MERGE)\b.*)$")
# DESCRIBE COLUMN col[.nested...] ON table / DESCRIBE SHORT table
# (reference CarbonSpark2SqlParser.scala:121-135,
#  CarbonDescribeColumnCommand / CarbonDescribeShortCommand)
_DESCRIBE_COLUMN = _ci(
    r"^\s*DESC(?:RIBE)?\s+COLUMN\s+([\w.]+)\s+ON\s+(?:TABLE\s+)?((?:\w+\.)?\w+)\s*$")
_DESCRIBE_SHORT = _ci(r"^\s*DESC(?:RIBE)?\s+SHORT\s+((?:\w+\.)?\w+)\s*$")
# CARBONCLI FOR TABLE t OPTIONS('-cmd'='summary'|'benchmark')
# (reference parser :625-633, CarbonCliCommand → tools/cli CarbonCli.java)
_CARBONCLI = _ci(
    r"^\s*CARBONCLI\s+FOR\s+TABLE\s+((?:\w+\.)?\w+)\s+OPTIONS\s*\((.*?)\)\s*$")
_DESCRIBE = _ci(r"^\s*DESC(?:RIBE)?\s+(FORMATTED\s+)?((?:\w+\.)?\w+)\s*$")
_COUNT_STAR = _ci(r"^\s*SELECT\s+COUNT\s*\(\s*\*\s*\)\s*(?:AS\s+(\w+)\s*)?"
                  r"FROM\s+((?:\w+\.)?\w+)\s*$")
# metadata-only MIN/MAX aggregates (blocklet min/max answer — the
# CarbonCountStar idea applied to extremes; falls back to a scan
# whenever Manifest.minmax_metadata can't answer exactly)
_MINMAX_AGG = _ci(
    r"^\s*SELECT\s+((?:MIN|MAX)\s*\(\s*\w+\s*\)(?:\s+AS\s+\w+)?"
    r"(?:\s*,\s*(?:MIN|MAX)\s*\(\s*\w+\s*\)(?:\s+AS\s+\w+)?)*)"
    r"\s+FROM\s+((?:\w+\.)?\w+)\s*$")
_MINMAX_ITEM = _ci(r"(MIN|MAX)\s*\(\s*(\w+)\s*\)(?:\s+AS\s+(\w+))?")
# SPJG shape for the MV-rewrite fast path
_SPJG = _ci(r"^\s*SELECT\s+(.*?)\s+FROM\s+((?:\w+\.)?\w+)"
            r"((?:\s+JOIN\s+\w+\s+ON\s+\w+\.\w+\s*=\s*\w+\.\w+)*)\s*"
            r"(?:WHERE\s+(.*?))?\s*GROUP\s+BY\s+(.*?)\s*$")
_JOIN_CLAUSE = _ci(r"JOIN\s+(\w+)\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)")
_AGG_ITEM = _ci(r"^\s*(sum|count|min|max|avg)\s*\(\s*(\*|\w+)\s*\)\s*"
                r"(?:AS\s+(\w+))?\s*$")
_TS_ITEM = _ci(r"^\s*timeseries\s*\(\s*(\w+)\s*,\s*'(\w+)'\s*\)\s*"
               r"(?:AS\s+(\w+))?\s*$")
# Session UDF surface (reference CarbonEnv.scala:83-113) handled as
# parser-level rewrites so the hot path stays JVM-side:
_TEXT_MATCH_FN = _ci(r"text_match(?:_with_limit)?\s*\(\s*'([^']+)'\s*"
                     r"(?:,\s*(\d+)\s*)?\)")
# text_match_with_limit('q', N) standing alone as the WHERE clause —
# the only composition whose limit-N semantics is sound to push
# (mirrors Lucene usage, reference docs lucene-index-guide.md)
_TEXT_MATCH_LIMIT_SOLE = _ci(
    r"FROM\s+((?:\w+\.)?\w+)\s+WHERE\s+text_match_with_limit\s*\(\s*'([^']+)'\s*,"
    r"\s*(\d+)\s*\)\s*(GROUP\s+BY|ORDER\s+BY|LIMIT|HAVING|$)")
_TIMESERIES_FN = _ci(r"timeseries\s*\(\s*([\w.]+)\s*,\s*'(\w+)'\s*\)")
_INSEGMENT_FN = _ci(r"insegment\s*\(\s*'([\d\s,]+)'\s*\)")
_FROM_TABLE = _ci(r"\bFROM\s+((?:\w+\.)?\w+)")
_NI_OPEN = _ci(r"\bNI\s*\(")


def _strip_ni(text: str) -> str:
    """Drop NI(...) wrappers, keeping the wrapped expression (the NI
    hint only disables secondary-index rewriting — CarbonEnv.scala:86-95,
    docs secondary-index-guide.md:159)."""
    while m := _NI_OPEN.search(text):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            depth += {"(": 1, ")": -1}.get(text[i], 0)
            i += 1
        inner = text[m.end():i - 1]
        text = text[:m.start()] + "(" + inner + ")" + text[i:]
    return text


def _stash_phrases_and_regexes(
        query: str) -> tuple[str, list[str], list[str]]:
    """Replace double-quoted phrases AND field:/re/ regexp terms in
    ONE left-to-right lexer pass (the way Lucene's QueryParser lexes
    both as single tokens — earliest token wins): a brics quoted
    literal inside a regexp (``/m"er"g/``) must not be stolen as a
    phrase, and a slash inside a quoted phrase must not open a
    regexp. Phrases become \\x00N\\x00 placeholders (a trailing ~N —
    sloppy phrase — stays attached for the term parser); regexp terms
    become \\x02N\\x02. Stray quotes left after the pass raise
    explicitly rather than silently mis-matching. Only a '/' directly
    after the field colon opens a regexp, so URL-ish terms
    (field:http://x) pass through."""
    phrases: list[str] = []
    regexes: list[str] = []

    def _stash(m: re.Match) -> str:
        if m.group(1) is not None:
            phrases.append(m.group(1))
            return f"\x00{len(phrases) - 1}\x00"
        regexes.append(m.group(2))
        return f"\x02{len(regexes) - 1}\x02"

    stashed = re.sub(
        r'"([^"]*)"|(?<=:)/((?:[^/\\"]|\\.|"[^"]*")+)/', _stash, query)
    if '"' in stashed:
        raise ValueError(f"text_match: unbalanced quotes in {query!r}")
    return stashed, phrases, regexes


def _stash_phrases(query: str) -> tuple[str, list[str]]:
    """Back-compat shim over :func:`_stash_phrases_and_regexes` for
    callers that only need phrases (regexp markers still land in the
    stashed text)."""
    stashed, phrases, _ = _stash_phrases_and_regexes(query)
    return stashed, phrases


def _stash_ranges(stashed: str) -> tuple[str, list[tuple]]:
    """Replace Lucene range terms [a TO b] / {a TO b} with \\x01N\\x01
    placeholders (brackets/space would otherwise confuse the
    whitespace tokenizer). Mixed brackets ([a TO b} etc.) follow
    Lucene: each end's inclusivity is its own bracket."""
    ranges: list[tuple] = []

    def _stash(m: re.Match) -> str:
        ranges.append((m.group(2), m.group(3),
                       m.group(1) == "[", m.group(4) == "]"))
        return f"\x01{len(ranges) - 1}\x01"

    out = re.sub(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])", _stash, stashed)
    return out, ranges


def _num_range_regex(lo: int, hi: int, width: int) -> str:
    """Regex matching the decimal strings of lo..hi zero-padded to
    ``width`` digits (classic digit-split recursion)."""
    slo, shi = str(lo).zfill(width), str(hi).zfill(width)
    if width == 0:
        return ""
    if slo == shi:
        return re.escape(slo)
    if slo[0] == shi[0]:
        return slo[0] + _num_range_regex(
            int(slo[1:] or 0), int(shi[1:] or 0), width - 1)
    rest = width - 1
    nines = int("9" * rest or 0)
    parts = []
    # partial low block: lo's first digit, suffixes lo[1:]..99..9
    if int(slo[1:] or 0) == 0:
        mid_lo = int(slo[0])        # lo block is full → fold into middle
    else:
        parts.append(slo[0] + _num_range_regex(int(slo[1:]), nines, rest))
        mid_lo = int(slo[0]) + 1
    # partial high block: hi's first digit, suffixes 00..0..hi[1:]
    if int(shi[1:] or 0) == nines:
        mid_hi = int(shi[0])        # hi block is full → fold into middle
        hi_part = None
    else:
        mid_hi = int(shi[0]) - 1
        hi_part = shi[0] + _num_range_regex(0, int(shi[1:]), rest)
    if mid_lo <= mid_hi:
        d = (f"[{mid_lo}-{mid_hi}]" if mid_lo != mid_hi else str(mid_lo))
        suffix = ("" if rest == 0 else
                  ("[0-9]" if rest == 1 else f"[0-9]{{{rest}}}"))
        parts.append(d + suffix)
    if hi_part is not None:
        parts.append(hi_part)
    return "(?:" + "|".join(parts) + ")" if len(parts) > 1 else parts[0]


def _interval_regex(smin: str, smax: str) -> str:
    """Lucene/brics ``<n-m>`` numeric interval → regex. Equal-length
    operands fix the width (zero-padded forms only); different
    lengths accept any number of leading zeros (brics
    RegExp.parseInterval → Automaton.makeInterval semantics)."""
    lo, hi = int(smin), int(smax)
    if lo > hi:
        lo, hi = hi, lo
        smin, smax = smax, smin
    if len(smin) == len(smax):
        return _num_range_regex(lo, hi, len(smin))
    by_len = []
    for width in range(len(str(lo)), len(str(hi)) + 1):
        wlo = max(lo, 10 ** (width - 1) if width > 1 else 0)
        whi = min(hi, 10 ** width - 1)
        if wlo <= whi:
            by_len.append(_num_range_regex(wlo, whi, width))
    return "0*(?:" + "|".join(by_len) + ")"


class _RegexNeedsAutomaton(ValueError):
    """A brics regexp feature a Java/RE2 regex CANNOT express —
    nested intersection ``&`` or complement ``~`` (regular languages
    are closed under both, regexes are not). Callers catch this and
    compile the term to the brics span-matcher UDF
    (functions/brics.py) instead of RLIKE."""


class _LuceneRegexTranslator:
    """Lucene RegexpQuery dialect → Java regex (RegexpQuery wraps
    org.apache.lucene.util.automaton.RegExp, the brics dialect —
    reference docs/index/lucene-index-guide.md, Lucene RegExp.java).
    Dialect differences handled: ``\\x`` always escapes to the
    LITERAL x (Java's ``\\d``/``\\w`` classes do not exist — Lucene
    users expect ``\\d`` = letter d); ``@`` matches any string; ``#``
    matches nothing; ``"..."`` is a literal string; ``<n-m>`` is a
    numeric interval; ``&`` is intersection (supported at the
    pattern's top level via lookahead — nested intersection raises);
    ``~`` (complement) is deprecated in Lucene and unsupported here;
    ``^``/``$`` are literal characters (matching is whole-token
    anchored already)."""

    def __init__(self, s: str):
        self.s, self.i = s, 0

    def _peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def _take(self) -> str:
        c = self._peek()
        self.i += 1
        return c

    def translate(self) -> str:
        out = self._union(spanning=True)
        if self.i != len(self.s):
            raise ValueError(
                f"text_match: trailing {self.s[self.i:]!r} in regexp "
                f"/{self.s}/")
        return out

    def _union(self, spanning: bool) -> str:
        parts = [self._inter(spanning)]
        while self._peek() == "|":
            self._take()
            parts.append(self._inter(spanning))
        return parts[0] if len(parts) == 1 else \
            "(?:" + "|".join(parts) + ")"

    def _inter(self, spanning: bool) -> str:
        first = self._concat()
        if self._peek() != "&":
            return first
        if not spanning:
            raise _RegexNeedsAutomaton(
                "text_match: nested regexp intersection '&' has no "
                "regex translation (evaluated by the brics span "
                "matcher instead)")
        parts = [first]
        while self._peek() == "&":
            self._take()
            parts.append(self._concat())
        return ("".join(f"(?=(?:{p})$)" for p in parts[:-1])
                + f"(?:{parts[-1]})")

    def _concat(self) -> str:
        parts = []
        while self._peek() not in ("", "|", "&", ")"):
            parts.append(self._repeat())
        return "".join(parts)

    def _repeat(self) -> str:
        base = self._atom()
        while True:
            c = self._peek()
            if c and c in "?*+":
                self._take()
                base = f"(?:{base}){c}"
            elif c == "{":
                m = re.match(r"\{(\d+)(,(\d*)?)?\}",
                             self.s[self.i:])
                if not m:
                    raise ValueError(
                        f"text_match: bad repetition at ...{self.s[self.i:]!r}")
                self.i += m.end()
                base = f"(?:{base}){m.group(0)}"
            else:
                return base

    def _atom(self) -> str:
        c = self._take()
        if c == "(":
            if self._peek() == ")":
                self._take()
                return "(?:)"
            inner = self._union(spanning=False)
            if self._take() != ")":
                raise ValueError(
                    f"text_match: unbalanced parens in regexp /{self.s}/")
            return f"(?:{inner})"
        if c == "[":
            return self._char_class()
        if c == ".":
            return "."
        if c == "@":
            return "(?:.*)"
        if c == "#":
            return "(?!)"
        if c == '"':
            j = self.s.find('"', self.i)
            if j < 0:
                raise ValueError(
                    f"text_match: unterminated \" in regexp /{self.s}/")
            lit = self.s[self.i:j]
            self.i = j + 1
            return re.escape(lit)
        if c == "<":
            m = re.match(r"(\d+)-(\d+)>", self.s[self.i:])
            if not m:
                raise ValueError(
                    f"text_match: bad interval at ...<{self.s[self.i:]!r} "
                    "(expected <n-m>)")
            self.i += m.end()
            return "(?:" + _interval_regex(m.group(1), m.group(2)) + ")"
        if c == "~":
            raise _RegexNeedsAutomaton(
                "text_match: regexp complement '~' has no regex "
                "translation (evaluated by the brics span matcher "
                "instead)")
        if c == "\\":
            nxt = self._take()
            if nxt == "":
                raise ValueError(
                    f"text_match: trailing backslash in regexp /{self.s}/")
            return re.escape(nxt)
        return re.escape(c)

    def _char_class(self) -> str:
        """Rebuild [...] so every member is a literal or range — never
        a Java class construct (&& intersection, \\d, [:posix:])."""
        out = "["
        if self._peek() == "^":
            out += self._take()
        first = True
        while True:
            c = self._take()
            if c == "":
                raise ValueError(
                    f"text_match: unterminated [ in regexp /{self.s}/")
            if c == "]" and not first:
                return out + "]"
            first = False
            if c == "\\":
                c = self._take()
                if c == "":
                    raise ValueError(
                        f"text_match: trailing backslash in regexp "
                        f"/{self.s}/")
            lo = c
            if self._peek() == "-" and self.s[self.i + 1:self.i + 2] not in ("", "]"):
                self._take()
                hi = self._take()
                if hi == "\\":
                    hi = self._take()
                out += f"{_class_escape(lo)}-{_class_escape(hi)}"
            else:
                out += _class_escape(lo)


def _class_escape(c: str) -> str:
    return "\\" + c if c in r"\^]-[&" else c


def _lucene_regex_to_java(pattern: str) -> str:
    """Translate a Lucene RegexpQuery pattern to the equivalent Java
    regex (see :class:`_LuceneRegexTranslator`)."""
    return _LuceneRegexTranslator(pattern).translate()


def _regex_sql(field: str, pattern: str, lowercase: bool = False,
               english: bool = False, stem=None) -> str:
    """Lucene RegexpQuery analogue: some whitespace token matches the
    regex WHOLLY (Lucene anchors regexps to the full term). The
    pattern is the LUCENE regexp dialect (brics): the common path
    translates to a Java regex (_lucene_regex_to_java) evaluated as
    RLIKE inside whole-stage codegen; nested intersection ``&`` and
    complement ``~`` have no regex translation and fall back to the
    Arrow-batched brics span-matcher UDF — the Python cost is paid
    only by queries using those operators. Under the 'standard'
    analyzer tokens are lowercased; under ``english`` the pattern
    applies UN-ANALYZED to the analyzed tokens — the stems — exactly
    as Lucene runs the automaton over index terms. The pattern itself
    is never rewritten."""
    try:
        java = _lucene_regex_to_java(pattern)
    except _RegexNeedsAutomaton:
        from .functions.brics import brics_compile
        brics_compile(pattern)      # syntax errors surface at compile
        mode = "eng" if english else ("std" if lowercase else "ws")
        return _spec_udf_call("__carbon_brics_regexp", field,
                                 {"rx": pattern, "mode": mode})
    pat = java.replace("\\", "\\\\").replace("'", "''")
    if english:
        from .functions.analyzers import stem_sql, stops_sql
        stem = stem or stem_sql
        arr = (f"transform(filter(split(lower({field}), '\\\\s+'), "
               f"__x -> __x != '' AND __x NOT IN ({stops_sql()})), "
               f"__t -> {stem('__t')})")
        return f"(exists({arr}, __s -> __s RLIKE '^(?:{pat})$'))"
    if lowercase:
        field = f"lower({field})"
    return (f"(exists(split({field}, '\\\\s+'), "
            f"__t -> __t != '' AND __t RLIKE '^(?:{pat})$'))")


def _range_sql(field: str, lo: str, hi: str, lo_inc: bool, hi_inc: bool,
               lowercase: bool = False, english: bool = False,
               stem=None) -> str:
    """Token-level range term: some whitespace token of ``field`` is
    lexicographically within [lo, hi] — classic Lucene TermRangeQuery
    semantics (string ordering; numeric point ranges are out of
    scope). Under ``english`` the bounds are NORMALIZED (lowercase —
    Lucene's normalize() applies no stemming) and compared against
    the ANALYZED tokens, which are the stems: '[sora TO sorz]'
    brackets stem 'sort', not surface 'sorts'. Compiles to a
    JVM-side higher-order predicate."""
    lo_op, hi_op = (">=" if lo_inc else ">"), ("<=" if hi_inc else "<")
    if english:
        from .functions.analyzers import stem_sql, stops_sql
        stem = stem or stem_sql
        lo = _sql_lit(lo.lower())
        hi = _sql_lit(hi.lower())
        arr = (f"transform(filter(split(lower({field}), '\\\\s+'), "
               f"__x -> __x != '' AND __x NOT IN ({stops_sql()})), "
               f"__t -> {stem('__t')})")
        return (f"(exists({arr}, __s -> __s {lo_op} '{lo}' "
                f"AND __s {hi_op} '{hi}'))")
    if lowercase:
        field, lo, hi = f"lower({field})", lo.lower(), hi.lower()
    lo, hi = _sql_lit(lo), _sql_lit(hi)
    return (f"(exists(split({field}, '\\\\s+'), "
            f"__t -> __t != '' AND __t {lo_op} '{lo}' "
            f"AND __t {hi_op} '{hi}'))")


def _sql_rx_escape(s: str) -> str:
    """Regex-escape a literal token AND double the backslashes so they
    survive Spark's SQL string-literal unescaping (re.escape alone
    emits single backslashes, which the SQL literal consumes — 'foo.'
    would reach the regex engine as 'foo.' and over-match)."""
    return re.escape(s).replace("\\", "\\\\")


def _sql_lit(s: str) -> str:
    """Escape a plain string for embedding in a Spark SQL string
    literal: backslashes FIRST (Spark's literal layer processes
    escape sequences), then single quotes. Using only the quote
    replacement silently corrupts tokens containing backslashes."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _phrase_regex(phrase: str, slop: int = 0) -> str:
    """Whitespace-token phrase → regex: tokens in order, separated by
    runs of whitespace (wildcards are literal inside phrases, as in
    Lucene). ``slop=N`` allows up to N intervening tokens between
    each consecutive pair — since the shared-budget reordering slop
    with repeat handling landed (_slop_window_sql), text_match only
    reaches this path at slop=0 (exact phrases)."""
    toks = phrase.split()
    if not toks:
        raise ValueError("text_match: empty phrase")
    sep = r"\\s+" if slop == 0 else r"(\\s+\\S+){0,%d}\\s+" % slop
    return sep.join(_sql_rx_escape(t) for t in toks)


# Lucene FuzzyQuery caps edit distance at 2 (LevenshteinAutomata
# maxEditDistance); bare `term~` defaults to 2.
_FUZZY_MAX_EDITS = 2


def _parse_fuzzy(pat: str) -> tuple[str, int] | None:
    """``term~`` / ``term~N`` → (term, N) per Lucene FuzzyQuery; None
    if not fuzzy syntax. Wildcards can't combine with fuzzy (same as
    Lucene) and N>2 raises (Lucene hard cap)."""
    m = re.fullmatch(r"([^~\s]+)~(\d*)", pat)
    if not m:
        return None
    base, n = m.group(1), m.group(2)
    edits = int(n) if n else _FUZZY_MAX_EDITS
    if edits > _FUZZY_MAX_EDITS:
        raise ValueError(
            f"text_match: fuzzy distance {edits} exceeds the Lucene "
            f"maximum of {_FUZZY_MAX_EDITS} (got {pat!r})")
    if "*" in base or "?" in base:
        raise ValueError(
            f"text_match: wildcards cannot combine with fuzzy ~ "
            f"(got {pat!r})")
    return base, edits


def _swap_variants(term: str, max_swaps: int) -> list[tuple[str, int]]:
    """Distinct variants of ``term`` under 1..``max_swaps`` DISJOINT
    adjacent-character swaps, with their swap count; the term itself
    is excluded. Disjointness mirrors a transposition consuming both
    characters (no re-editing a transposed pair)."""
    out: dict[str, int] = {}
    n = len(term)
    singles = [i for i in range(n - 1) if term[i] != term[i + 1]]
    for i in singles:
        s = term[:i] + term[i + 1] + term[i] + term[i + 2:]
        out.setdefault(s, 1)
    if max_swaps >= 2:
        for ai, i in enumerate(singles):
            for j in singles[ai + 1:]:
                if j - i < 2:
                    continue
                s = list(term)
                s[i], s[i + 1] = s[i + 1], s[i]
                s[j], s[j + 1] = s[j + 1], s[j]
                out.setdefault("".join(s), 2)
    return [(v, c) for v, c in out.items() if v != term]


def _dam_pred_sql(tvar: str, term: str, edits: int) -> str:
    """SQL predicate for damerau_levenshtein(tvar, term) <= edits
    (edits <= 2), built from engine-portable primitives: plain
    ``levenshtein`` plus a precomputed disjoint-swap expansion of the
    (fixed) query term and a one-swap scan of the (variable) token.
    For edits <= 2 the decomposition equals the unrestricted Damerau
    distance threshold (property-tested against DuckDB's
    damerau_levenshtein in tests/test_analyzers.py) — transpositions
    cost one edit, Lucene FuzzyQuery's default transpositions=true."""
    t = _sql_lit(term)
    parts = [f"levenshtein({tvar}, '{t}') <= {edits}"]
    variants = _swap_variants(term, edits)
    singles = [_sql_lit(v) for v, c in variants if c == 1]
    doubles = [_sql_lit(v) for v, c in variants if c == 2]
    if edits == 1:
        if singles:
            vs = ", ".join(f"'{v}'" for v in singles)
            parts.append(f"{tvar} IN ({vs})")
    elif edits >= 2:
        if singles:
            vs = ", ".join(f"'{v}'" for v in singles)
            parts.append(f"exists(array({vs}), "
                         f"__v -> levenshtein({tvar}, __v) <= 1)")
        if doubles:
            vs = ", ".join(f"'{v}'" for v in doubles)
            parts.append(f"{tvar} IN ({vs})")
        # token-side transposition (one swap of the token, one lev
        # edit left): swap positions i,i+1 of the token and compare
        parts.append(
            f"(length({tvar}) >= 2 AND exists("
            f"sequence(1, length({tvar}) - 1), __i -> "
            f"levenshtein(concat(substring({tvar}, 1, __i - 1), "
            f"substring({tvar}, __i + 1, 1), substring({tvar}, __i, 1), "
            f"substring({tvar}, __i + 2, length({tvar}))), "
            f"'{t}') <= 1))")
    return "(" + " OR ".join(parts) + ")"


def _fuzzy_sql(field: str, term: str, edits: int,
               lowercase: bool = False,
               transpositions: bool = True) -> str:
    """Token-level fuzzy match as a JVM-side higher-order function:
    some whitespace token of ``field`` is within ``edits`` edits of
    ``term`` (Lucene FuzzyQuery on a whitespace analyzer; reference
    lucene-index-guide.md fuzzy queries). ``transpositions`` counts an
    adjacent swap as ONE edit (Damerau; Lucene's default) via
    :func:`_dam_pred_sql`; False falls back to plain Levenshtein (the
    index property 'fuzzy_transpositions'='false'). Stays JVM-side —
    no Python UDF."""
    if lowercase:
        field, term = f"lower({field})", term.lower()
    if transpositions:
        pred = _dam_pred_sql("__t", term, edits)
    else:
        t = _sql_lit(term)
        pred = f"levenshtein(__t, '{t}') <= {edits}"
    return (f"(exists(split({field}, '\\\\s+'), "
            f"__t -> __t != '' AND {pred}))")


_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")


def _strip_boost(pat: str) -> tuple[str, float]:
    """Lucene boost suffix term^N: boosts scale BM25 scoring only —
    matching is unaffected (BoostQuery wraps, never filters)."""
    if m := _BOOST.search(pat):
        return pat[:m.start()], float(m.group(1))
    return pat, 1.0


def _english_term_sql(field: str, pat: str,
                      stem=None, analyze=None) -> str | None:
    """Term/wildcard predicate under the 'english' analyzer: evaluate
    against the ANALYZED token stream (lowercase → stop-remove → stem,
    functions/analyzers.py) exactly as the postings were built, so
    index pruning stays sound. A stopword term returns None — the
    clause is DROPPED, Lucene QueryParser behavior (the analyzer
    returns no token, so the clause vanishes from the BooleanQuery).
    Wildcard patterns match the stemmed token dictionary as-is
    (Lucene evaluates multi-term queries against index terms).
    ``stem``/``analyze`` swap the stemmer (the porter dictionary fast
    path passes a JVM-side map lookup + porter_analyze)."""
    from .functions.analyzers import analyze_term, stem_sql, stops_sql
    stem = stem or stem_sql
    analyze = analyze or analyze_term
    pat = pat.lower()
    body = f"split(lower({field}), '\\\\s+')"
    keep = f"__t != '' AND __t NOT IN ({stops_sql()})"
    if "*" in pat or "?" in pat:
        rx = "".join(
            r"\\S*" if part == "*" else (r"\\S" if part == "?"
                                         else _sql_rx_escape(part))
            for part in re.split(r"([*?])", pat) if part != "")
        cond = f"({stem('__t')}) RLIKE '^(?:{rx})$'"
    else:
        q = analyze(pat)
        if q is None:
            return None
        cond = f"({stem('__t')}) = '{_sql_lit(q)}'"
    return f"(exists({body}, __t -> {keep} AND {cond}))"


def _english_fuzzy_sql(field: str, term: str, edits: int,
                       transpositions: bool = True, stem=None) -> str:
    """Fuzzy term under the 'english' analyzer — Lucene semantics:
    FuzzyQuery NORMALIZES the query term (lowercase; normalize() does
    not stem or stop-filter) and expands it against the INDEX terms,
    which are stemmed — so 'motoring~1' compares 'motoring' to stems
    like 'motor' (distance 3: no match). The refine evaluates the
    same thing: some analyzed (stop-removed, stemmed) token of the
    field within ``edits`` Damerau edits of the lowercased term."""
    from .functions.analyzers import stem_sql, stops_sql
    stem = stem or stem_sql
    t = term.lower()
    if transpositions:
        pred = _dam_pred_sql("__s", t, edits)
    else:
        pred = f"levenshtein(__s, '{_sql_lit(t)}') <= {edits}"
    arr = (f"transform(filter(split(lower({field}), '\\\\s+'), "
           f"__x -> __x != '' AND __x NOT IN ({stops_sql()})), "
           f"__t -> {stem('__t')})")
    return f"(exists({arr}, __s -> {pred}))"


def _slop_window_sql(arr: str, offs: list[tuple[int, str]],
                     slop: int) -> str:
    """Sloppy phrase with Lucene's SHARED slop budget, reordering, and
    REPEAT handling — SloppyPhraseMatcher semantics: an INJECTIVE
    assignment of query terms (offset ``o_i``) to token positions
    ``p_i`` (repeated query terms may not reuse a token position —
    Lucene's PhrasePositions repeat groups) matches when
    max(p_i - o_i) - min(p_i - o_i) <= slop (matchLength over
    offset-adjusted positions; two adjacent terms reversed cost 2,
    the documented "switch the order of two words requires two
    moves"). Compiled as pure JVM-side HOFs: bind the analyzed array
    once, build one position list per DISTINCT term, and match iff
    some candidate window start ``a`` (an offset-adjusted position —
    the optimal window starts at its own minimum) admits an injective
    assignment into [a, a+slop]. Injectivity is decided exactly by
    Hall's condition on consecutive offset runs: for a term repeated
    at offsets o_i <= … <= o_j, at least j-i+1 of its positions must
    fall inside SOME occurrence window [a+o_k, a+o_k+slop] (k=i..j) —
    sufficient as well as necessary because the occurrence windows
    are same-length and sorted, so greedy smallest-position
    assignment is optimal. Distinct terms occupy disjoint position
    sets, so their matchings compose freely. ``offs`` terms must be
    SQL-literal-escaped by the caller; a term with no occurrence
    fails its own i=j Hall clause, so absence short-circuits to
    no-match."""
    groups: dict[str, list[int]] = {}
    for o, q in offs:
        groups.setdefault(q, []).append(o)
    terms = [(q, sorted(os_)) for q, os_ in groups.items()]
    plists = ", ".join(
        f"filter(sequence(1, size(__arr)), "
        f"__p -> element_at(__arr, __p) = '{q}')"
        for q, _ in terms)
    starts = ", ".join(
        f"transform(element_at(__ps, {si + 1}), __q -> __q - {o})"
        for si, (_, os_) in enumerate(terms) for o in os_)
    conds = []
    for si, (_, os_) in enumerate(terms):
        for i in range(len(os_)):
            for j in range(i, len(os_)):
                need = j - i + 1
                member = " OR ".join(
                    f"(__x >= __a + {os_[k]} AND "
                    f"__x <= __a + {os_[k] + slop})"
                    for k in range(i, j + 1))
                if need == 1:
                    conds.append(f"exists(element_at(__ps, {si + 1}), "
                                 f"__x -> {member})")
                else:
                    conds.append(
                        f"size(filter(element_at(__ps, {si + 1}), "
                        f"__x -> {member})) >= {need}")
    cond = " AND ".join(conds)
    return (f"(exists(array({arr}), __arr -> "
            f"size(__arr) >= 1 AND "
            f"exists(array(array({plists})), __ps -> "
            f"exists(flatten(array({starts})), __a -> {cond}))))")


def _english_sloppy_sql(field: str, phrase: str, slop: int,
                        stem=None, analyze=None) -> str | None:
    """Sloppy phrase under 'english', evaluated over the analyzed
    stream with stop-gap positions, via Lucene's shared slop budget
    with reordering and repeat handling (_slop_window_sql — repeated
    analyzed terms included since round 6)."""
    from .functions.analyzers import (analyze_term, is_stopword, stem_sql,
                                      stops_sql)
    stem = stem or stem_sql
    analyze = analyze or analyze_term
    toks = phrase.lower().split()
    if not toks:
        raise ValueError("text_match: empty phrase")
    terms = [(i, analyze(t)) for i, t in enumerate(toks)
             if not is_stopword(t)]
    if not terms:
        return None
    first = terms[0][0]
    offs = [(i - first, _sql_lit(q)) for i, q in terms]
    arr = (f"transform(filter(split(lower({field}), '\\\\s+'), "
           f"__x -> __x != ''), __t -> "
           f"CASE WHEN __t IN ({stops_sql()}) THEN NULL "
           f"ELSE {stem('__t')} END)")
    return _slop_window_sql(arr, offs, slop)


def _english_phrase_sql(field: str, phrase: str,
                        stem=None, analyze=None) -> str | None:
    """Exact phrase under the 'english' analyzer, with Lucene's
    StopFilter POSITION GAPS (enablePositionIncrements=true): the
    analyzed doc stream maps every token to its stem but a stopword
    occupies its position emitting nothing (NULL), and the query
    phrase's surviving terms keep their relative offsets — so
    '"quick the foxes"' requires stem 'fox' exactly TWO positions
    after 'quick' (any single token may sit between, matching
    PhraseQuery over the gapped positions), while '"quick foxes"'
    requires adjacency. An all-stopword phrase analyzes to nothing →
    clause dropped (None). Pure JVM-side HOFs: the one-element
    array(...) exists() binds the analyzed array once, the inner
    sequence() scan probes each start position; the size guard
    short-circuits so ANSI element_at can't see an out-of-range
    index. Reference: LuceneFineGrainIndex.java:63-204 analyzer
    pipeline + PhraseQuery positions."""
    from .functions.analyzers import (analyze_term, is_stopword, stem_sql,
                                      stops_sql)
    stem = stem or stem_sql
    analyze = analyze or analyze_term
    toks = phrase.lower().split()
    if not toks:
        raise ValueError("text_match: empty phrase")
    terms = [(i, analyze(t)) for i, t in enumerate(toks)
             if not is_stopword(t)]
    if not terms:
        return None
    first = terms[0][0]
    offs = [(i - first, q) for i, q in terms]
    maxoff = offs[-1][0]
    arr = (f"transform(filter(split(lower({field}), '\\\\s+'), "
           f"__x -> __x != ''), __t -> "
           f"CASE WHEN __t IN ({stops_sql()}) THEN NULL "
           f"ELSE {stem('__t')} END)")
    conds = " AND ".join(
        f"element_at(__arr, __p + {o}) = '{_sql_lit(q)}'" if o else
        f"element_at(__arr, __p) = '{_sql_lit(q)}'"
        for o, q in offs)
    return (f"(exists(array({arr}), __arr -> "
            f"size(__arr) > {maxoff} AND "
            f"exists(sequence(1, size(__arr) - {maxoff}), "
            f"__p -> {conds})))")


def _spec_udf_call(fn: str, field: str, spec: dict) -> str:
    """Compile a predicate as a call to a registered Arrow-batched
    UDF, the spec carried as base64(JSON) — a SQL string literal that
    needs no escaping regardless of what the user's pattern contains
    (quotes, backslashes, control markers). Used by every
    porter-analyzer term type and the brics regexp fallback."""
    b = base64.b64encode(
        json.dumps(spec, sort_keys=True).encode()).decode()
    return f"({fn}({field}, '{b}'))"


def _porter_phrase_match(arr: list, offs: list, slop: int) -> bool:
    """Positional phrase match over a porter-analyzed stream with
    stop-gap positions (None = removed stopword holding its slot) —
    the Python twin of _english_phrase_sql/_slop_window_sql: exact
    requires each surviving query term at its relative offset; sloppy
    uses Lucene's SHARED slop budget with reordering and repeat
    handling (an INJECTIVE assignment matches when
    max(p_i - o_i) - min(p_i - o_i) <= slop; injectivity decided by
    Hall's condition on consecutive same-term offset runs), matching
    the SQL analyzers' behavior exactly."""
    n = len(arr)
    first = offs[0][1]
    if slop == 0:
        maxoff = offs[-1][0]
        return any(
            arr[p] == first and all(arr[p + o] == s for o, s in offs)
            for p in range(n - maxoff))
    groups: dict = {}
    for o, s in offs:
        groups.setdefault(s, []).append(o)
    pos = {s: [p for p, v in enumerate(arr) if v == s] for s in groups}
    if any(not pos[s] for s in groups):
        return False
    starts = [p - o for s, os_ in groups.items()
              for o in os_ for p in pos[s]]
    for a in starts:
        ok = True
        for s, os_ in groups.items():
            os_s = sorted(os_)
            for i in range(len(os_s)):
                for j in range(i, len(os_s)):
                    cnt = sum(
                        1 for x in pos[s]
                        if any(a + os_s[k] <= x <= a + os_s[k] + slop
                               for k in range(i, j + 1)))
                    if cnt < j - i + 1:
                        ok = False
                        break
                if not ok:
                    break
            if not ok:
                break
        if ok:
            return True
    return False


def _porter_stem_map(mapping: dict[str, str]):
    """surface→stem as a JVM-side map-literal lookup, the ``stem``
    callable the english compile paths accept: tokens absent from the
    dictionary (none exist while the index is fresh — sql.Engine only
    builds the mapping then) pass through unstemmed via coalesce.
    Identity entries are elided — the coalesce default covers them."""
    items = ", ".join(
        f"'{_sql_lit(k)}', '{_sql_lit(v)}'"
        for k, v in sorted(mapping.items()) if k != v)
    if not items:
        return lambda var: var
    m = f"map({items})"
    return lambda var: f"coalesce(element_at({m}, {var}), {var})"


def _porter_term_sql(field: str, pat: str, phrases: list[str],
                     ranges: list[tuple], regexes: list[str],
                     transpositions: bool = True,
                     fast: tuple | None = None) -> str | None:
    """Predicate compiler for the 'porter' analyzer — every term type.

    FAST PATH (``fast`` = (covered columns, stem callable), built by
    Engine._porter_fast from the index's surface→stem dictionary
    sidecar when the vocabulary is small and the index fresh): the
    predicate compiles through the SAME pure-SQL shapes the 'english'
    analyzer uses, with the stemmer swapped for a JVM-side map
    lookup — no Python in the plan (plan-asserted in
    tests/test_analyzers.py). Automaton-only regexps (nested &/~)
    keep the UDF fallback, as under 'english'.

    UDF PATH (large vocabulary, stale index, or opted out via
    'dict_fastpath'='false'): Porter's measure conditions have no
    general SQL form, so each term compiles to a session-registered
    Arrow-batched UDF (_ensure_porter_udf) — the deliberate Python
    hot path, worker-parallel at cluster scale. The semantics mirror
    the 'english' analyzer exactly, stemmer swapped:

    - term: analyzed (stop-drop → stem) vs the analyzed stream; a
      stopword term drops its clause (Lucene QueryParser);
    - wildcard: pattern UN-analyzed vs the stemmed dictionary (Lucene
      multi-term queries run over index terms);
    - phrase (exact + sloppy): stop-gap positions, per-gap slop;
    - fuzzy: query term normalized (lowercase, NOT stemmed — Lucene
      FuzzyQuery.normalize()) vs the stems, Damerau by default;
    - range: bounds normalized (lowercase only) vs the stems;
    - regexp: the Lucene/brics dialect translated then applied
      un-analyzed to the stems."""
    from .functions.porter import porter_analyze
    if fast and field in fast[0]:
        stem = fast[1]
        if pm := re.fullmatch(r"\x00(\d+)\x00(?:~(\d*))?", pat):
            phrase = phrases[int(pm.group(1))]
            if pm.group(2):
                return _english_sloppy_sql(field, phrase,
                                           int(pm.group(2)),
                                           stem=stem,
                                           analyze=porter_analyze)
            return _english_phrase_sql(field, phrase, stem=stem,
                                       analyze=porter_analyze)
        if fz := (_parse_fuzzy(pat) if "~" in pat else None):
            return _english_fuzzy_sql(field, *fz,
                                      transpositions=transpositions,
                                      stem=stem)
        if rm := re.fullmatch(r"\x01(\d+)\x01", pat):
            return _range_sql(field, *ranges[int(rm.group(1))],
                              english=True, stem=stem)
        if xm := re.fullmatch(r"\x02(\d+)\x02", pat):
            raw = regexes[int(xm.group(1))]
            try:
                _lucene_regex_to_java(raw)
            except _RegexNeedsAutomaton:
                pass      # automaton-only: the brics UDF path below
            else:
                return _regex_sql(field, raw, english=True, stem=stem)
        elif not re.search(r"[\x00\x01\x02~]", pat):
            return _english_term_sql(field, pat, stem=stem,
                                     analyze=porter_analyze)
    if pm := re.fullmatch(r"\x00(\d+)\x00(?:~(\d*))?", pat):
        phrase = phrases[int(pm.group(1))]
        slop = int(pm.group(2)) if pm.group(2) else 0
        toks = phrase.lower().split()
        if not toks:
            raise ValueError("text_match: empty phrase")
        terms = [(i, porter_analyze(t)) for i, t in enumerate(toks)]
        terms = [(i, q) for i, q in terms if q is not None]
        if not terms:
            return None
        first = terms[0][0]
        return _spec_udf_call(
            "__carbon_porter_phrase", field,
            {"slop": slop, "offs": [[i - first, q] for i, q in terms]})
    if fz := (_parse_fuzzy(pat) if "~" in pat else None):
        term, edits = fz
        return _spec_udf_call(
            "__carbon_porter_fuzzy", field,
            {"t": term.lower(), "e": edits, "tr": bool(transpositions)})
    if rm := re.fullmatch(r"\x01(\d+)\x01", pat):
        lo, hi, lo_inc, hi_inc = ranges[int(rm.group(1))]
        return _spec_udf_call(
            "__carbon_porter_range", field,
            {"lo": lo.lower(), "hi": hi.lower(),
             "li": bool(lo_inc), "hi_inc": bool(hi_inc)})
    if xm := re.fullmatch(r"\x02(\d+)\x02", pat):
        raw = regexes[int(xm.group(1))]
        try:
            spec = {"rx": _lucene_regex_to_java(raw)}
        except _RegexNeedsAutomaton:
            from .functions.brics import brics_compile
            brics_compile(raw)      # syntax errors surface at compile
            spec = {"brics": raw}
        return _spec_udf_call("__carbon_porter_regexp", field, spec)
    if re.search(r"[\x00\x01\x02~]", pat):
        raise ValueError(
            f"text_match: cannot parse term under the 'porter' "
            f"analyzer: {pat!r}")
    if "*" in pat or "?" in pat:
        rx = "".join(
            ".*" if part == "*" else ("." if part == "?"
                                      else re.escape(part))
            for part in re.split(r"([*?])", pat.lower()) if part != "")
        return (f"(__carbon_porter_wild({field}, "
                f"'{rx.replace(chr(92), chr(92) * 2).replace(chr(39), chr(39) * 2)}'))")
    q = porter_analyze(pat)
    if q is None:
        return None
    return f"(__carbon_porter_match({field}, '{_sql_lit(q)}'))"


def _term_sql(tok: str, phrases: list[str], ranges: list[tuple],
              regexes: list[str], lowercase: bool = False,
              english: bool = False,
              transpositions: bool = True,
              porter: bool = False,
              porter_fast: tuple | None = None) -> str | None:
    """One 'field:pattern' term → SQL predicate (token-boundary RLIKE;
    phrases exact or sloppy; fuzzy via levenshtein HOF; a ^boost
    suffix is stripped — it only affects ranking). ``lowercase``
    compiles against lower(field) with lowercased patterns — the
    'standard' analyzer; ``english`` compiles every term type against
    the stemmed stop-filtered token stream (stop-gap positions for
    phrases) and returns None for analyzer-dropped (stopword)
    clauses; ``porter`` does the same through Arrow-batched UDFs
    (_porter_term_sql — Porter's measure conditions have no SQL
    form)."""
    m = re.match(r"^([\w.]+):(\S+)$", tok)
    if not m:
        raise ValueError(f"text_match: cannot parse term {tok!r}")
    field, pat = m.groups()
    pat, _ = _strip_boost(pat)
    if porter:
        return _porter_term_sql(field, pat, phrases, ranges, regexes,
                                transpositions, fast=porter_fast)
    if english:
        if pm := re.fullmatch(r"\x00(\d+)\x00(?:~(\d*))?", pat):
            if pm.group(2):
                return _english_sloppy_sql(field,
                                           phrases[int(pm.group(1))],
                                           int(pm.group(2)))
            return _english_phrase_sql(field, phrases[int(pm.group(1))])
        if (fz := _parse_fuzzy(pat) if "~" in pat else None):
            return _english_fuzzy_sql(field, *fz,
                                      transpositions=transpositions)
        if rm := re.fullmatch(r"\x01(\d+)\x01", pat):
            return _range_sql(field, *ranges[int(rm.group(1))],
                              english=True)
        if xm := re.fullmatch(r"\x02(\d+)\x02", pat):
            return _regex_sql(field, regexes[int(xm.group(1))],
                              english=True)
        if re.search(r"[\x00\x01\x02]", pat) or "~" in pat:
            raise ValueError(
                f"text_match: cannot parse term {tok!r} under the "
                "'english' analyzer")
        return _english_term_sql(field, pat)
    if rm := re.fullmatch(r"\x01(\d+)\x01", pat):
        return _range_sql(field, *ranges[int(rm.group(1))],
                          lowercase=lowercase)
    if xm := re.fullmatch(r"\x02(\d+)\x02", pat):
        return _regex_sql(field, regexes[int(xm.group(1))],
                          lowercase=lowercase)
    if "\x02" in pat:
        raise ValueError(
            "text_match: cannot parse regexp term (expected field:/re/)")
    if "\x01" in pat:
        raise ValueError(
            f"text_match: cannot parse range term (expected "
            f"field:[a TO b] or field:{{a TO b}})")
    if pm := re.fullmatch(r"\x00(\d+)\x00(?:~(\d*))?", pat):
        slop = int(pm.group(2)) if pm.group(2) else 0
        phrase = phrases[int(pm.group(1))]
        toks = (phrase.lower() if lowercase else phrase).split()
        if slop > 0 and toks:
            # shared slop budget with reordering and repeat handling
            # (Lucene SloppyPhraseMatcher) over whitespace token
            # positions
            src = f"lower({field})" if lowercase else field
            arr = f"filter(split({src}, '\\\\s+'), __x -> __x != '')"
            offs = [(o, _sql_lit(t)) for o, t in enumerate(toks)]
            return _slop_window_sql(arr, offs, slop)
        # lowercase the TOKENS, never the built regex (that would
        # corrupt \S escapes)
        rx = _phrase_regex(phrase.lower() if lowercase else phrase,
                           slop=slop)
    elif "\x00" in pat:
        raise ValueError(
            f"text_match: cannot parse term {tok!r} (quoted phrases "
            "must span the whole term value: field:\"a b\")")
    elif fz := _parse_fuzzy(pat) if "~" in pat else None:
        return _fuzzy_sql(field, *fz, lowercase=lowercase,
                          transpositions=transpositions)
    elif "~" in pat:
        raise ValueError(
            f"text_match: cannot parse fuzzy term {tok!r} "
            "(expected term~ or term~N, N <= 2)")
    else:
        if lowercase:
            pat = pat.lower()
        # wildcards become regex operators, everything else is escaped
        # for BOTH the regex engine and the SQL literal layer
        rx = "".join(
            r"\\S*" if part == "*" else (r"\\S" if part == "?"
                                         else _sql_rx_escape(part))
            for part in re.split(r"([*?])", pat) if part != "")
    if lowercase:
        field = f"lower({field})"
    return f"({field} RLIKE '(^|\\\\s){rx}($|\\\\s)')"


def _parse_group(toks: list[str], i: int, phrases: list[str],
                 ranges: list[tuple] | None = None,
                 regexes: list[str] | None = None,
                 lowercase: bool = False,
                 english: bool = False,
                 transpositions: bool = True,
                 porter: bool = False,
                 porter_fast: tuple | None = None) -> tuple[str | None, int]:
    """One parenthesis level: operands joined by AND/OR (explicit) or
    adjacency (implicit OR — Lucene's default operator), with NOT as
    strict boolean negation and +/- occur prefixes. When any +/- is
    present the group combines as a Lucene BooleanQuery bag
    (BooleanClause.Occur: all MUSTs AND no MUST_NOTs; SHOULDs only
    required when no MUST exists); otherwise strict boolean with SQL's
    native AND-over-OR precedence (round-3 behavior, unchanged)."""
    # (conn, occur, negated, base_sql) per operand
    items: list[tuple[str | None, str | None, bool, str]] = []
    while i < len(toks):
        t = toks[i]
        if t == ")":
            break
        conn = None
        if t.upper() in ("AND", "OR"):
            if not items:
                raise ValueError(f"text_match: dangling {t.upper()}")
            conn = t.upper()
            i += 1
            if i >= len(toks) or toks[i] == ")":
                raise ValueError(f"text_match: dangling {conn}")
            t = toks[i]
        negated = False
        occur = None
        while True:
            if t.upper() == "NOT":
                negated = not negated
            elif t in ("+", "-"):
                occur = t
            elif t.startswith("+") and len(t) > 1:
                occur, t = "+", t[1:]
                break
            elif t.startswith("-") and len(t) > 1 and ":" in t:
                occur, t = "-", t[1:]
                break
            else:
                break
            i += 1
            if i >= len(toks) or toks[i] == ")":
                raise ValueError("text_match: dangling NOT/+/-")
            t = toks[i]
        if t == "(":
            sql, i = _parse_group(toks, i + 1, phrases, ranges, regexes,
                                  lowercase, english, transpositions,
                                  porter, porter_fast)
            if i >= len(toks) or toks[i] != ")":
                raise ValueError("text_match: unbalanced parentheses")
            i += 1
        else:
            sql = _term_sql(t, phrases, ranges or [], regexes or [],
                            lowercase, english, transpositions, porter,
                            porter_fast)
            i += 1
        items.append((conn, occur, negated, sql))
    if not items:
        raise ValueError("text_match: empty group")
    # analyzer-dropped clauses (english stopwords, sql=None) vanish
    # from the boolean — Lucene's StopFilter removes the token before
    # the BooleanQuery is built, so the clause (and its connective,
    # and any NOT/+/- on it) simply never existed
    items = [it for it in items if it[3] is not None]
    if not items:
        return None, i          # whole group analyzed away
    if any(occ for _, occ, _, _ in items):
        # BooleanQuery bag: explicit AND promotes both sides to MUST;
        # a NOT-negated clause is a MUST_NOT (Lucene: NOT x ≡ -x) —
        # it must never be silently dropped as an optional SHOULD
        must, must_not, should = [], [], []
        for idx, (conn, occ, neg, sql) in enumerate(items):
            if occ == "-" or neg:
                must_not.append(sql)
            elif occ == "+" or conn == "AND" or (
                    idx + 1 < len(items) and items[idx + 1][0] == "AND"
                    and occ is None):
                must.append(sql)
            else:
                should.append(sql)
        if not must and not should:
            raise ValueError(
                "text_match: pure-negative query matches nothing (Lucene "
                "BooleanQuery needs at least one positive clause)")
        parts = []
        if must:
            parts.append(" AND ".join(must))
        else:
            parts.append("(" + " OR ".join(should) + ")")
        parts.extend(f"NOT {s}" for s in must_not)
        return "(" + " AND ".join(parts) + ")", i
    out = []
    for conn, _, neg, sql in items:
        if out:
            out.append(conn or "OR")      # adjacency = Lucene default OR
        out.append(f"NOT {sql}" if neg else sql)
    return "(" + " ".join(out) + ")", i


def _lucene_to_sql(query: str, lowercase: bool = False,
                   english: bool = False,
                   transpositions: bool = True,
                   porter: bool = False,
                   porter_fast: tuple | None = None) -> str:
    """Translate a Lucene-ish text_match query into a whitespace-token
    RLIKE/levenshtein predicate — the exact-refine half of the
    reference's Lucene fine-grain index (LuceneFineGrainIndex.java:
    63-204). Supported: 'field:term' with * / ? wildcards, quoted
    phrases (exact and '...'~N sloppy), fuzzy term~N, AND/OR/NOT,
    parenthesized groups, implicit-OR adjacency, +/- occur prefixes
    (Lucene BooleanQuery bag semantics), ^boosts (ranking only),
    [a TO b] / {a TO b} term ranges, and /re/ regexp terms. The
    'standard' analyzer property compiles everything
    case-insensitively. Unsupported syntax raises, never silently
    mis-parses. NOTE: with explicit operators,
    AND binds tighter than OR in the emitted SQL (round-3 documented
    precedence). Fuzzy terms count an adjacent transposition as ONE
    edit (Damerau, Lucene FuzzyQuery's transpositions=true default);
    ``transpositions=False`` (index property
    'fuzzy_transpositions'='false') restores plain Levenshtein."""
    stashed, phrases, regexes = _stash_phrases_and_regexes(query.strip())
    stashed, ranges = _stash_ranges(stashed)
    toks = re.findall(r"\(|\)|[^\s()]+", stashed)
    sql, i = _parse_group(toks, 0, phrases, ranges, regexes, lowercase,
                          english, transpositions, porter, porter_fast)
    if i != len(toks):
        raise ValueError(
            f"text_match: unbalanced parentheses in {query!r}")
    if sql is None:
        # every clause was analyzer-dropped (all-stopword query):
        # Lucene's empty BooleanQuery matches nothing. NOT "(false)" —
        # Spark's parser reads "FROM t WHERE (false)" as table alias
        # WHERE with column list (false) and fails with an arity error;
        # a comparison inside the parens is unambiguous.
        return "(1 = 0)"
    return sql


def _ensure_porter_udf(spark) -> None:
    """Register the Arrow-batched Porter refine UDF once per session.
    Porter's measure conditions (functions/porter.py) have no SQL
    form, so 'porter'-analyzer term predicates call this UDF — the
    one deliberate Python hot path in the text_match surface, opted
    into by the index property."""
    if getattr(spark, "_carbon_porter_udf_registered", False):
        return
    from .functions.porter import porter_analyze

    @F.pandas_udf("boolean")
    def _match(text: pd.Series, stem: pd.Series) -> pd.Series:
        out = []
        for tx, st in zip(text, stem):
            if tx is None:
                out.append(False)
                continue
            out.append(any(a == st for a in
                           (porter_analyze(t) for t in tx.split())
                           if a is not None))
        return pd.Series(out)

    @F.pandas_udf("boolean")
    def _wild(text: pd.Series, rx: pd.Series) -> pd.Series:
        # wildcard over the ANALYZED tokens — Lucene evaluates
        # multi-term queries against index terms (the stems), with the
        # pattern applied un-analyzed
        out = []
        compiled: dict[str, "re.Pattern"] = {}
        for tx, pattern in zip(text, rx):
            if tx is None:
                out.append(False)
                continue
            cre = compiled.get(pattern)
            if cre is None:
                cre = compiled.setdefault(pattern, re.compile(pattern))
            out.append(any(cre.fullmatch(a) for a in
                           (porter_analyze(t) for t in tx.split())
                           if a is not None))
        return pd.Series(out)

    from .functions.analyzers import damerau_levenshtein, levenshtein
    from .functions.porter import porter_stream

    def _decode(cache: dict, b64: str):
        v = cache.get(b64)
        if v is None:
            v = cache.setdefault(
                b64, json.loads(base64.b64decode(b64)))
        return v

    @F.pandas_udf("boolean")
    def _phrase(text: pd.Series, spec: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for tx, sp in zip(text, spec):
            if tx is None:
                out.append(False)
                continue
            d = _decode(cache, sp)
            offs = [(int(o), s) for o, s in d["offs"]]
            out.append(_porter_phrase_match(porter_stream(tx), offs,
                                            int(d["slop"])))
        return pd.Series(out)

    @F.pandas_udf("boolean")
    def _fuzzy(text: pd.Series, spec: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for tx, sp in zip(text, spec):
            if tx is None:
                out.append(False)
                continue
            d = _decode(cache, sp)
            dist = damerau_levenshtein if d["tr"] else levenshtein
            term, edits = d["t"], int(d["e"])
            out.append(any(s is not None and dist(s, term) <= edits
                           for s in porter_stream(tx)))
        return pd.Series(out)

    @F.pandas_udf("boolean")
    def _rng(text: pd.Series, spec: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for tx, sp in zip(text, spec):
            if tx is None:
                out.append(False)
                continue
            d = _decode(cache, sp)
            lo, hi = d["lo"], d["hi"]
            ok_lo = ((lambda s: s >= lo) if d["li"]
                     else (lambda s: s > lo))
            ok_hi = ((lambda s: s <= hi) if d["hi_inc"]
                     else (lambda s: s < hi))
            out.append(any(s is not None and ok_lo(s) and ok_hi(s)
                           for s in porter_stream(tx)))
        return pd.Series(out)

    @F.pandas_udf("boolean")
    def _rgx(text: pd.Series, spec: pd.Series) -> pd.Series:
        from .functions.brics import brics_match
        cache: dict = {}
        compiled: dict = {}
        out = []
        for tx, sp in zip(text, spec):
            if tx is None:
                out.append(False)
                continue
            test = compiled.get(sp)
            if test is None:
                d = _decode(cache, sp)
                if "brics" in d:    # nested &/~: span matcher
                    pat = d["brics"]
                    test = compiled.setdefault(
                        sp, lambda s, _p=pat: brics_match(_p, s))
                else:
                    cre = re.compile(d["rx"])
                    test = compiled.setdefault(
                        sp, lambda s, _c=cre: _c.fullmatch(s))
            out.append(any(s is not None and test(s)
                           for s in porter_stream(tx)))
        return pd.Series(out)

    spark.udf.register("__carbon_porter_match", _match)
    spark.udf.register("__carbon_porter_wild", _wild)
    spark.udf.register("__carbon_porter_phrase", _phrase)
    spark.udf.register("__carbon_porter_fuzzy", _fuzzy)
    spark.udf.register("__carbon_porter_range", _rng)
    spark.udf.register("__carbon_porter_regexp", _rgx)
    spark._carbon_porter_udf_registered = True


def _ensure_brics_udf(spark) -> None:
    """Register the Arrow-batched brics regexp UDF once per session —
    the slow-path evaluator for regexp terms using nested ``&`` or
    complement ``~``, which regular-language automata express but
    regexes cannot (functions/brics.py). The whitespace/standard/
    english analyzers reach it through _regex_sql's fallback; porter
    reuses its own _rgx UDF with a brics spec."""
    if getattr(spark, "_carbon_brics_udf_registered", False):
        return
    from .functions.analyzers import is_stopword, minimal_stem
    from .functions.brics import brics_match

    @F.pandas_udf("boolean")
    def _brx(text: pd.Series, spec: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for tx, sp in zip(text, spec):
            if tx is None:
                out.append(False)
                continue
            d = cache.get(sp)
            if d is None:
                d = cache.setdefault(
                    sp, json.loads(base64.b64decode(sp)))
            rx, mode = d["rx"], d["mode"]
            toks = tx.split()
            if mode == "std":
                toks = [t.lower() for t in toks]
            elif mode == "eng":
                toks = [minimal_stem(t)
                        for t in (t.lower() for t in toks)
                        if not is_stopword(t)]
            out.append(any(brics_match(rx, t) for t in toks))
        return pd.Series(out)

    spark.udf.register("__carbon_brics_regexp", _brx)
    spark._carbon_brics_udf_registered = True


def _parse_props(s: str | None) -> dict:
    """'k1'='v1', 'k2'='v2' → dict (list-valued for comma strings).
    Values may be double-quoted instead ('QUOTECHAR'="'") so a value
    containing a single quote is expressible."""
    props: dict = {}
    if not s:
        return props
    for k, v1, v2 in re.findall(
            r"'([^']+)'\s*=\s*(?:'([^']*)'|\"([^\"]*)\")", s):
        k = k.lower()
        v = v1 if v1 or not v2 else v2
        if k in ("sort_columns", "bucket_columns", "partition_by"):
            props[k] = [c.strip() for c in v.split(",") if c.strip()]
        else:
            props[k] = v
    return props


class Engine:
    """A warehouse of segment-managed tables + the extended-SQL
    dispatcher. ``Engine(spark, dir).sql(...)`` is the user entry —
    same role as a CarbonSession."""

    # EXPLAIN MERGE may fall back to a real source min/max aggregate
    # when the manifest can't answer (mor deltas, statless column) —
    # but only below this source row count, so EXPLAIN never launches
    # a scan-level job against a large table.
    _EXPLAIN_SCAN_ROW_CAP = 10_000_000

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse_dir)
        os.makedirs(self.warehouse, exist_ok=True)
        self.streams = StreamManager(spark)
        self._current_db = "default"
        # SET carbon.input.segments scopes (canonical db.table → ids)
        self._input_segments: dict[str, list[int]] = {}
        # view-registration stat keys (skip re-register while unchanged)
        self._view_keys: dict[str, tuple] = {}

    # --------------------------------------------------------------- catalog

    def _resolve(self, name: str) -> tuple[str, str]:
        """(database, table) for a possibly db-qualified name. Bare
        names resolve in the session's current database (USE db);
        'default' is the warehouse ROOT — the pre-database layout, so
        existing single-schema warehouses work unchanged (the
        reference resolves the same way through CarbonEnv's current
        database, CarbonSpark2SqlParser.scala:233-237,412-417)."""
        db, _, t = name.rpartition(".")
        return (db or self._current_db), t

    def _canon(self, name: str) -> str:
        db, t = self._resolve(name)
        return f"{db}.{t}"

    def _dir(self, name: str) -> str:
        db, t = self._resolve(name)
        if db == "default":
            return os.path.join(self.warehouse, t)
        return os.path.join(self.warehouse, db, t)

    def _exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(
            self._dir(name), "_meta", "tablestatus.json"))

    def _view_name(self, name: str) -> str:
        """Spark temp views can't carry a database qualifier, so every
        table registers under '<db>__<table>' and the CURRENT db's
        tables additionally under their bare names; _qualify rewrites
        query references to match."""
        db, t = self._resolve(name)
        return t if db == self._current_db else f"{db}__{t}"

    def databases(self) -> list[str]:
        out = ["default"]
        for d in sorted(os.listdir(self.warehouse)):
            if os.path.exists(os.path.join(self.warehouse, d, ".database")):
                out.append(d)
        return out

    def table(self, name: str) -> Table:
        return Table.open(self.spark, self._dir(name))

    def tables(self, db: str | None = None) -> list[str]:
        db = db or self._current_db
        root = (self.warehouse if db == "default"
                else os.path.join(self.warehouse, db))
        if not os.path.isdir(root):
            return []
        return sorted(
            d for d in os.listdir(root)
            if os.path.exists(os.path.join(root, d, "_meta",
                                           "tablestatus.json")))

    def _register_views(self) -> None:
        """(Re)register temp views — every table as '<db>__<table>',
        the current db's tables also under their bare names — skipped
        while the table's manifest is unchanged (stat key), so
        per-query driver overhead doesn't scale with warehouse size ×
        file count."""
        for db in self.databases():
            for name in self.tables(db):
                t = Table.open(self.spark, self._dir(f"{db}.{name}"))
                try:
                    key = t.manifest._stat_key()
                except OSError:
                    key = None
                vnames = [f"{db}__{name}"]
                if db == self._current_db:
                    vnames.append(name)
                df = None
                for vn in vnames:
                    if key is not None and self._view_keys.get(vn) == key:
                        continue
                    df = t.read() if df is None else df
                    df.createOrReplaceTempView(vn)
                    self._view_keys[vn] = key

    def _qualify(self, text: str) -> str:
        """Rewrite db-qualified table references in passthrough SQL to
        their registered view names. Only TABLE positions (after
        FROM/JOIN/INTO/TABLE/UPDATE/USING) rewrite, and only when the
        qualifier is a KNOWN database — alias.column expressions are
        never touched; string literals are stashed first so a quoted
        'a.b' survives verbatim."""
        if "." not in text:
            return text
        dbs = set(self.databases())
        lits: list[str] = []

        def stash(m: re.Match) -> str:
            lits.append(m.group(0))
            return f"\x03{len(lits) - 1}\x03"

        stashed = re.sub(r"'(?:[^']|'')*'", stash, text)

        def repl(m: re.Match) -> str:
            kw, db, t = m.group(1), m.group(2), m.group(3)
            if db not in dbs:
                return m.group(0)
            return f"{kw} {self._view_name(f'{db}.{t}')}"

        out = _QUAL_REF.sub(repl, stashed)
        return re.sub(r"\x03(\d+)\x03",
                      lambda m: lits[int(m.group(1))], out)

    def _df(self, rows: list[tuple], schema: str) -> DataFrame:
        return self.spark.createDataFrame(rows, schema)

    # ------------------------------------------------------------------ sql

    def _require_db(self, name: str) -> None:
        db, t = self._resolve(name)
        if "__" in t:
            # '__' is the view-namespace separator (_view_name maps
            # db.t -> 'db__t'), so a default-db table literally named
            # 'a__b' would collide with database a's table b in the
            # temp-view namespace — reject at creation/rename time
            raise ValueError(
                f"table name {t!r} may not contain '__' (reserved as"
                " the database-qualified view separator)")
        if db != "default" and db not in self.databases():
            raise FileNotFoundError(
                f"database {db!r} does not exist — CREATE DATABASE first")

    def sql(self, text: str) -> DataFrame:
        text = text.strip().rstrip(";")

        if m := _CREATE_DATABASE.match(text):
            db = m.group(1)
            if db != "default":
                d = os.path.join(self.warehouse, db)
                os.makedirs(d, exist_ok=True)
                open(os.path.join(d, ".database"), "a").close()
            return self._ok(f"database {db}")
        if m := _DROP_DATABASE.match(text):
            db, cascade = m.group(1), bool(m.group(2))
            if db == "default":
                raise ValueError("cannot drop the default database")
            if db == self._current_db:
                raise ValueError("cannot drop the current database")
            if db in self.databases():
                if self.tables(db) and not cascade:
                    raise ValueError(
                        f"database {db!r} is not empty (use CASCADE)")
                shutil.rmtree(os.path.join(self.warehouse, db))
            return self._ok(f"dropped database {db}")
        if m := _USE_DB.match(text):
            db = m.group(1)
            if db not in self.databases():
                raise FileNotFoundError(f"database {db!r} does not exist")
            if db != self._current_db:
                self._current_db = db
                # bare-name views must rebind to the new db's tables
                self._view_keys = {k: v for k, v in self._view_keys.items()
                                   if "__" in k}
            return self._ok(f"using {db}")
        if _SHOW_DATABASES.match(text):
            return self._df([(d,) for d in self.databases()],
                            "namespace string")
        if m := _CREATE_LIKE.match(text):
            self._require_db(m.group(1))
            src = self.table(m.group(2))
            doc = src.manifest.load()
            Table.create(self.spark, self._dir(m.group(1)),
                         doc["schema"], doc.get("properties", {}))
            return self._ok(f"created {m.group(1)} like {m.group(2)}")
        if m := _CTAS.match(text):
            self._require_db(m.group(1))
            self._register_views()
            Table.create_as_select(self.spark, self._dir(m.group(1)),
                                   self.spark.sql(self._qualify(m.group(2))))
            return self._ok(f"created {m.group(1)}")
        if m := _CREATE_TABLE.match(text):
            self._require_db(m.group(1))
            Table.create(self.spark, self._dir(m.group(1)), m.group(2).strip(),
                         _parse_props(m.group(3)))
            return self._ok(f"created {m.group(1)}")
        if m := _DROP_TABLE.match(text):
            shutil.rmtree(self._dir(m.group(1)), ignore_errors=True)
            return self._ok(f"dropped {m.group(1)}")
        if m := _LOAD_DATA.match(text):
            opts = _parse_props(m.group(4))
            gsp = opts.get("global_sort_partitions")
            fh = opts.get("fileheader")
            seg = self.table(m.group(3)).load_csv(
                m.group(1), overwrite=bool(m.group(2)),
                delimiter=opts.get("delimiter", ","),
                header=opts.get("header", "true").lower() != "false",
                bad_records_action=opts.get("bad_records_action", "FORCE"),
                quotechar=opts.get("quotechar", '"'),
                escapechar=opts.get("escapechar", "\\"),
                commentchar=opts.get("commentchar"),
                multiline=opts.get("multiline", "false").lower() == "true",
                line_separator=opts.get("line_separator"),
                skip_empty_line=opts.get(
                    "skip_empty_line", "true").lower() != "false",
                fileheader=[c.strip() for c in fh.split(",")] if fh else None,
                complex_delimiter=opts.get(
                    "complex_delimiter_level_1", "\001"),
                dateformat=opts.get("dateformat"),
                timestampformat=opts.get("timestampformat"),
                sort_scope=opts.get("sort_scope"),
                sort_column_bounds=opts.get("sort_column_bounds"),
                global_sort_partitions=int(gsp) if gsp else None,
                bad_record_path=opts.get("bad_record_path"),
                is_empty_data_bad_record=opts.get(
                    "is_empty_data_bad_record", "false").lower() == "true")
            return self._ok(f"segment {seg}")
        if m := _INSERT_STAGE.match(text):
            opts = _parse_props(m.group(2))
            bfc = opts.get("batch_file_count")
            seg = self.table(m.group(1)).insert_stage(
                batch_file_count=int(bfc) if bfc else None)
            return self._ok("stage empty" if seg is None else f"segment {seg}")
        if m := _DELETE_STAGE.match(text):
            opts = _parse_props(m.group(2))
            n = self.table(m.group(1)).delete_stage(
                retain_hour=float(opts.get("retain_hour", 0)))
            return self._ok(f"removed {n}")
        if m := _INSERT.match(text):
            self._register_views()
            seg = self.table(m.group(2)).insert(
                self.spark.sql(self._qualify(m.group(3))),
                overwrite=m.group(1).lower() == "overwrite")
            return self._ok(f"segment {seg}")
        if m := _UPDATE_TUPLE.match(text):
            cols = [c.strip() for c in m.group(2).split(",")]
            rhs = m.group(3).strip()
            # subquery RHS (CarbonSpark2SqlParser.scala:259-300 allows
            # SET (c1,..) = (SELECT ..)): uncorrelated — evaluate once,
            # bind the single row's values positionally as literals
            self._register_views()
            if rhs.lower().startswith("select"):
                rows = self.spark.sql(self._qualify(rhs)).collect()
                if len(rows) != 1:
                    raise ValueError(
                        f"UPDATE subquery must return exactly 1 row, "
                        f"got {len(rows)}")
                vals = [repr(v) if isinstance(v, str) else str(v)
                        for v in rows[0]]
            else:
                vals = [v.strip() for v in rhs.split(",")]
            n = dml.update_rows(self.table(m.group(1)),
                                dict(zip(cols, vals)), m.group(4) or "true")
            return self._ok(f"updated {n}")
        if m := _DELETE_SEGMENT_ID.match(text):
            ids = [int(x) for x in m.group(2).replace(",", " ").split()]
            self.table(m.group(1)).delete_segment_by_id(ids)
            return self._ok(f"deleted segments {ids}")
        if m := _DELETE_SEGMENT_DATE.match(text):
            import datetime
            ts = datetime.datetime.fromisoformat(m.group(2)).timestamp()
            self.table(m.group(1)).delete_segment_by_date(ts)
            return self._ok("deleted segments by date")
        if m := _DELETE.match(text):
            self._register_views()      # WHERE may contain subqueries
            cond = m.group(2) or "true"
            n = dml.delete_rows(self.table(m.group(1)), cond,
                                predicates=parse_simple_condition(cond))
            return self._ok(f"deleted {n}")
        if (m := _UPDATE_PLAIN.match(text)) and "=" in m.group(2):
            sets = dict(kv.split("=", 1) for kv in m.group(2).split(","))
            sets = {k.strip(): v.strip() for k, v in sets.items()}
            cond = m.group(3) or "true"
            n = dml.update_rows(self.table(m.group(1)), sets, cond,
                                predicates=parse_simple_condition(cond))
            return self._ok(f"updated {n}")
        if m := _SET_INPUT_SEGMENTS.match(text):
            t, ids = self._canon(m.group(1)), m.group(2).strip()
            if ids == "*":
                self._input_segments.pop(t, None)
                return self._ok(f"reset segments for {t}")
            self._input_segments[t] = [
                int(x) for x in ids.replace(",", " ").split()]
            return self._ok(f"segments {self._input_segments[t]} for {t}")
        if m := _SHOW_SEGMENTS_AS.match(text):
            t, limit, sel = m.group(1), m.group(2), m.group(3)
            df = self.table(t).show_segments(
                history=True, limit=int(limit) if limit else None)
            df.createOrReplaceTempView(f"{self._view_name(t)}_segments")
            return self.spark.sql(self._qualify(sel))
        if m := _SHOW_HISTORY_SEGMENTS.match(text):
            return self.table(m.group(1)).show_segments(history=True)
        if m := _SHOW_SEGMENTS.match(text):
            return self.table(m.group(1)).show_segments(
                limit=int(m.group(2)) if m.group(2) else None)
        if m := _CLEAN_FILES.match(text):
            opts = _parse_props(m.group(2)) if m.group(2) else {}
            res = self.table(m.group(1)).clean_files(
                force=opts.get("force", "false").lower() == "true",
                stale_inprogress=opts.get(
                    "stale_inprogress", "false").lower() == "true",
                dryrun=opts.get("dryrun", "false").lower() == "true")
            if isinstance(res, dict):       # dryrun report
                return self._df(
                    [(json.dumps(res["would_clean_segments"]),
                      res["trash_bytes"])],
                    "would_clean_segments string, trash_bytes bigint")
            return self._ok(f"cleaned {res}")
        if m := _ALTER_ADD_SEGMENT.match(text):
            opts = {k.lower(): v for k, v in
                    _parse_props(m.group(2)).items()}
            if "path" not in opts:
                raise ValueError("ADD SEGMENT requires a 'path' option")
            seg = self.table(m.group(1)).add_segment(
                opts["path"], fmt=opts.get("format", "parquet").lower(),
                stats=opts.get("stats", "footer").lower())
            return self._ok(f"added segment {seg}")
        if m := _ALTER_COMPACT.match(text):
            kind = m.group(2).lower()
            if kind in ("streaming", "close_streaming"):
                # handoff: convert finished streaming segments to columnar
                # (reference CompactionType.STREAMING/CLOSE_STREAMING,
                #  StreamHandoffRDD.scala:99+); CLOSE_STREAMING also
                # closes the open segment first
                from .streaming.streams import handoff
                done = handoff(self.table(m.group(1)),
                               include_open=kind == "close_streaming")
                return self._ok(f"handed off segments {done}")
            ids = ([int(x) for x in m.group(3).replace(",", " ").split()]
                   if m.group(3) else None)
            seg = self.table(m.group(1)).compact(kind, segment_ids=ids)
            return self._ok(f"compacted → {seg}")
        if m := _ALTER_ADD_COLS.match(text):
            t = self.table(m.group(1))
            defaults = {k.split(".")[-1]: v
                        for k, v in _parse_props(m.group(3)).items()
                        if k.lower().startswith("default.value.")}
            for spec in m.group(2).split(","):
                col, dtype = spec.strip().split(None, 1)
                t.add_column(col, dtype, default=defaults.get(col))
            return self._ok("added columns")
        if m := _ALTER_DROP_COLS.match(text):
            t = self.table(m.group(1))
            for col in m.group(2).split(","):
                t.drop_column(col.strip())
            return self._ok("dropped columns")
        if m := _ALTER_FINISH_STREAMING.match(text):
            finish_streaming(self.table(m.group(1)))
            return self._ok("finished streaming")
        if m := _ALTER_SET_PROPS.match(text):
            self.table(m.group(1)).set_properties(_parse_props(m.group(2)))
            return self._ok("properties set")
        if m := _ALTER_UNSET_PROPS.match(text):
            keys = [k.strip().strip("'\"") for k in m.group(2).split(",")]
            self.table(m.group(1)).unset_properties(keys)
            return self._ok("properties unset")
        if m := _ALTER_RENAME_TABLE.match(text):
            old, new = m.group(1), m.group(2)
            if self._exists(new):
                raise ValueError(f"table {new!r} already exists")
            self._require_db(new)
            os.rename(self._dir(old), self._dir(new))
            for vn in {self._view_name(old),
                       "{}__{}".format(*self._resolve(old))}:
                self.spark.catalog.dropTempView(vn)
                self._view_keys.pop(vn, None)
            return self._ok(f"renamed {old} → {new}")
        if m := _SHOW_CREATE_TABLE.match(text):
            ddl = self.table(m.group(1)).show_create(m.group(1))
            return self._df([(ddl,)], "createtab_stmt string")
        if m := _ALTER_CHANGE.match(text):
            t, old, new, dtype = (self.table(m.group(1)), m.group(2),
                                  m.group(3), m.group(4).strip())
            if old != new:
                t.rename_column(old, new)
            cur = dict(zip(t._schema_struct().fieldNames(),
                           [f.dataType.simpleString()
                            for f in t._schema_struct().fields]))
            if cur.get(new, "").lower() != dtype.lower().replace(" ", ""):
                t.change_column_type(new, dtype)
            return self._ok(f"changed {old} → {new} {dtype}")
        if m := _TRUNCATE.match(text):
            self.table(m.group(1)).truncate()
            return self._ok("truncated")
        if m := _ADD_PARTITION.match(text):
            seg = self.table(m.group(1)).add_partition(
                _parse_part_spec(m.group(2)), m.group(3))
            return self._ok(f"added partition as segment {seg}")
        if m := _DROP_PARTITION.match(text):
            n = self.table(m.group(1)).drop_partition(
                _parse_part_spec(m.group(2)))
            return self._ok(f"dropped {n} files")
        if m := _SHOW_PARTITIONS.match(text):
            parts = self.table(m.group(1)).show_partitions()
            return self._df(
                [(", ".join(f"{k}={v}" for k, v in sorted(p.items())),)
                 for p in parts],
                "partition string")
        if m := _CREATE_INDEX.match(text):
            t, cols = self.table(m.group(2)), \
                [c.strip() for c in m.group(3).split(",")]
            kind = m.group(4).lower()
            if kind == "carbondata":
                t.indexes.create_secondary_index(m.group(1), cols)
            elif kind == "bloomfilter":
                t.indexes.create_bloom_index(m.group(1), cols)
            elif kind == "lucene":
                props = _parse_props(m.group(5))
                t.indexes.create_fts_index(
                    m.group(1), cols,
                    analyzer=props.get("analyzer", "whitespace"),
                    fuzzy_transpositions=props.get(
                        "fuzzy_transpositions", "true").lower() != "false",
                    dict_fastpath=props.get(
                        "dict_fastpath", "true").lower() != "false",
                    dict_fastpath_max=int(props.get(
                        "dict_fastpath_max", "2000")))
            elif kind == "ivf":
                # CREATE INDEX v ON TABLE t (id_col, vec_col) AS 'ivf'
                # [PROPERTIES('k'='16','iters'='2','pq_m'='4',
                #  'pq_codes'='16')] — pq_m upgrades the sidecar to
                # IVF-PQ (per-row codes, ADC search never reads the
                # raw vectors)
                if len(cols) != 2:
                    raise ValueError("ivf index needs (id_col, vector_col)")
                props = _parse_props(m.group(5))
                t.vector_indexes.create(
                    m.group(1), cols[0], cols[1],
                    k=int(props.get("k", "16")),
                    iters=int(props.get("iters", "2")),
                    pq_m=(int(props["pq_m"]) if "pq_m" in props else None),
                    pq_codes=int(props.get("pq_codes", "16")))
            else:
                raise ValueError(f"unsupported index kind {kind!r}")
            return self._ok(f"index {m.group(1)}")
        if m := _REINDEX.match(text):
            rebuilt = self.table(m.group(2)).indexes.repair(m.group(1))
            return self._ok(f"reindexed {','.join(rebuilt) or '(none stale)'}")
        if m := _REGISTER_INDEX.match(text):
            # re-attach an existing index table after metadata refresh
            # (reference RegisterIndexTableCommand): validate + repair
            t = self.table(m.group(2))
            if not any(i["name"] == m.group(1) for i in t.indexes.show()):
                raise FileNotFoundError(f"index {m.group(1)} not found")
            t.indexes.repair(m.group(1))
            return self._ok(f"registered index {m.group(1)}")
        if m := _DROP_INDEX.match(text):
            self.table(m.group(2)).indexes.drop(m.group(1))
            return self._ok(f"dropped index {m.group(1)}")
        if m := _SHOW_INDEXES.match(text):
            rows = self.table(m.group(1)).indexes.show()
            return self._df(
                [(r["name"], r["type"], ",".join(r["columns"]),
                  r["watermark_segment"]) for r in rows],
                "name string, type string, columns string, watermark_segment int")
        if m := _CREATE_MV.match(text):
            return self._create_mv(m.group(1), bool(m.group(2)), m.group(3))
        if m := _REFRESH_MV.match(text):
            MVManager(self.table(m.group(2))).refresh(m.group(1))
            return self._ok(f"refreshed {m.group(1)}")
        if m := _DROP_MV.match(text):
            MVManager(self.table(m.group(2))).drop(m.group(1))
            return self._ok(f"dropped {m.group(1)}")
        if m := _SHOW_MV.match(text):
            rows = MVManager(self.table(m.group(1))).show()
            return self._df(
                [(r["name"], ",".join(r["group_cols"]), bool(r["stale"]))
                 for r in rows],
                "name string, group_cols string, stale boolean")
        if m := _CREATE_STREAM.match(text):
            props = _parse_props(m.group(3))
            src_path = props.get("source_path")
            if props.get("source_table"):       # managed-table source
                src_path = self._dir(props["source_table"])
            info = self.streams.create_stream(
                m.group(1), self.table(m.group(2)),
                source_kind=("table" if props.get("source_table")
                             else props.get("source_kind", "file")),
                source_path=src_path,
                source_format=props.get("record_format", "csv"),
                source_schema=props.get("source_schema"),
                trigger_interval=props.get("interval"))
            return self._ok(f"stream {info.name} started")
        if m := _DROP_STREAM.match(text):
            self.streams.drop_stream(m.group(1))
            return self._ok(f"dropped stream {m.group(1)}")
        if _SHOW_STREAMS.match(text):
            rows = self.streams.show_streams()
            return self._df(
                [(r["name"], r["source"], r["sink"], r["status"]) for r in rows],
                "name string, source string, sink string, status string")
        if m := _MERGE.match(text):
            return self._merge_sql(*m.groups())
        if m := _SHOW_TABLES.match(text):
            return self._df([(t,) for t in self.tables(m.group(1))],
                            "table_name string")
        if m := _REFRESH_TABLE.match(text):
            # metadata re-sync (RefreshCarbonTableCommand analogue):
            # re-read the manifest and rebind the catalog view
            name = m.group(1)
            vn = self._view_name(name)
            self.table(name).read().createOrReplaceTempView(vn)
            self._view_keys.pop(vn, None)
            return self._ok(f"refreshed {name}")
        if m := _SHOW_METACACHE.match(text):
            names = [m.group(1)] if m.group(1) else self.tables()
            rows = []
            for name in names:
                t = self.table(name)
                doc = t.manifest.load()
                mpath = os.path.join(t.table_dir, "_meta")
                mbytes = sum(os.path.getsize(os.path.join(mpath, f))
                             for f in os.listdir(mpath)) \
                    if os.path.isdir(mpath) else 0
                rows.append((name, len(doc.get("segments", [])),
                             sum(len(s["files"]) for s in doc["segments"]),
                             len(t.indexes.show()), mbytes))
            return self._df(rows, "table string, n_segments int, "
                                  "n_files int, n_indexes int, meta_bytes bigint")
        if m := _DROP_METACACHE.match(text):
            # our manifests are read per-operation (nothing pinned on the
            # driver); evict any Spark-side cached scan of the table
            self.spark.catalog.clearCache()
            return self._ok(f"dropped cache for {m.group(1)}")
        if m := _EXPLAIN.match(text):
            return self._explain(m.group(1))
        if m := _EXPLAIN_ANY.match(text):
            if (df := self._explain_command(m.group(1))) is not None:
                return df
            # not an engine DML — fall through (Spark explains its own
            # SQL via the passthrough below)
        if m := _DESCRIBE_COLUMN.match(text):
            return self._describe_column(m.group(2), m.group(1))
        if m := _DESCRIBE_SHORT.match(text):
            return self._describe_short(m.group(1))
        if m := _CARBONCLI.match(text):
            opts = _parse_props(m.group(2))
            cmd = opts.get("-cmd", "summary")
            from . import cli
            if cmd == "summary":
                out = cli.summary(self._dir(m.group(1)))
            elif cmd == "benchmark":
                out = cli.bench(self._dir(m.group(1)))
            else:
                raise ValueError(f"carboncli: unsupported -cmd {cmd!r}")
            rows = [(k, json.dumps(v, default=str)) for k, v in out.items()]
            return self._df(rows, "item string, value string")
        if m := _DESCRIBE.match(text):
            return self._describe(m.group(2), formatted=bool(m.group(1)))
        if m := _COUNT_STAR.match(text):
            # CarbonCountStar fast path: valid only when every queryable
            # segment has footer row counts (same guard idea as
            # DMLStrategy.scala:265-292)
            name = m.group(2)
            if self._exists(name):
                alias = m.group(1) or "count(1)"
                return self._df(
                    [(self.table(name).count(
                        segments=self._input_segments.get(
                            self._canon(name))),)],
                    f"`{alias}` bigint")
        if m := _MINMAX_AGG.match(text):
            name = m.group(2)
            if self._exists(name):
                items = [(f.upper(), c, a or f"{f.lower()}({c})")
                         for f, c, a in _MINMAX_ITEM.findall(m.group(1))]
                mm = self.table(name).manifest.minmax_metadata(
                    sorted({c for _, c, _ in items}),
                    segment_ids=self._input_segments.get(
                        self._canon(name)))
                if mm is not None:
                    vals, fields = [], []
                    for f, c, a in items:
                        v = mm[c][0 if f == "MIN" else 1]
                        vals.append(v)
                        t = "double" if isinstance(v, float) else "bigint"
                        fields.append(f"`{a}` {t}")
                    return self._df([tuple(vals)], ", ".join(fields))
                # metadata can't answer exactly → scan path below
        # MV rewrite fast path, then plain Spark SQL over views
        if (df := self._try_mv_rewrite(text)) is not None:
            return df
        text, seg_scope, fts_preds, tm_limit = self._rewrite_udf_surface(text)
        # SET carbon.input.segments scopes (insegment() wins if both);
        # seg_scope keys are CANONICAL db.table names
        for tname, segs in self._input_segments.items():
            seg_scope.setdefault(tname, segs)
        self._register_views()
        for tname, segs in seg_scope.items():
            vn = self._view_name(tname)
            self.table(tname).read(segments=segs) \
                .createOrReplaceTempView(vn)
            self._view_keys.pop(vn, None)   # scoped view: re-register next
        if fts_preds:
            # rebind the queried table through the FTS candidate file set
            # (files not containing every required token are skipped)
            ft = _FROM_TABLE.search(text)
            if ft and self._exists(ft.group(1)) \
                    and self._canon(ft.group(1)) not in seg_scope:
                t = self.table(ft.group(1))
                if any(m["type"] == "fts" for m in t.indexes.show()):
                    vn = self._view_name(ft.group(1))
                    t.read(predicates=fts_preds,
                           apply_predicates=False).createOrReplaceTempView(vn)
                    self._view_keys.pop(vn, None)
        if tm_limit:
            self._build_tm_limited(*tm_limit,
                                   segments=seg_scope.get(
                                       self._canon(tm_limit[0])))
        return self.spark.sql(self._qualify(text))

    def _fts_common_analyzer(self, text: str) -> str:
        """The analyzer shared by EVERY fts index on the queried table,
        else 'whitespace'. With a mixed set, compiling the query
        case-insensitively (or stemmed) while a whitespace index prunes
        with case-SENSITIVE postings would drop matching files — so
        mixed tables compile conservatively as whitespace (pruning
        through the richer index then over-includes, which is
        sound)."""
        ft = _FROM_TABLE.search(text)
        if not (ft and self._exists(ft.group(1))):
            return "whitespace"
        try:
            metas = self.table(ft.group(1)).indexes.show()
        except FileNotFoundError:
            return "whitespace"
        fts = [m for m in metas if m["type"] == "fts"]
        kinds = {m.get("analyzer", "whitespace") for m in fts}
        return kinds.pop() if len(kinds) == 1 else "whitespace"

    def _porter_fast(self, text: str) -> tuple | None:
        """(covered fields, stem callable) for the porter dictionary
        fast path, or None. Eligible when the queried table's porter
        FTS index is FRESH (covers every segment — same envelope the
        file pruning uses) and its surface→stem dictionary sidecar
        fits 'dict_fastpath_max': porter predicates then compile to
        the english-analyzer SQL shapes with a JVM-side map lookup as
        the stemmer, keeping the Arrow UDF out of the plan entirely
        (the same dictionary-expansion idea fuzzy pruning uses).
        Multiple porter indexes merge (one stemmer → no conflicts)."""
        ft = _FROM_TABLE.search(text)
        if not (ft and self._exists(ft.group(1))):
            return None
        t = self.table(ft.group(1))
        try:
            metas = t.indexes.show()
        except FileNotFoundError:
            return None
        cols: set[str] = set()
        mapping: dict[str, str] = {}
        for m in metas:
            if m["type"] != "fts":
                continue
            d = t.indexes.porter_dict(m)
            if d is not None:
                cols.update(d[0])
                mapping.update(d[1])
        if not cols:
            return None
        return frozenset(cols), _porter_stem_map(mapping)

    def _fts_fuzzy_transpositions(self, text: str) -> bool:
        """False only when EVERY fts index on the queried table sets
        'fuzzy_transpositions'='false' (else the richer Damerau
        default applies; pruning always expands with Damerau, a sound
        superset of the Levenshtein match set)."""
        ft = _FROM_TABLE.search(text)
        if not (ft and self._exists(ft.group(1))):
            return True
        try:
            metas = self.table(ft.group(1)).indexes.show()
        except FileNotFoundError:
            return True
        fts = [m for m in metas if m["type"] == "fts"]
        return not (fts and all(m.get("fuzzy_transpositions", True) is False
                                for m in fts))

    def _build_tm_limited(self, tbl: str, q: str, n: int,
                          lc: bool = False, eng: bool = False,
                          trans: bool = True, por: bool = False,
                          pfast: tuple | None = None,
                          segments: list[int] | None = None) -> None:
        """Materialize ``__tm_limited``: the top-``n`` rows of ``tbl``
        matching Lucene-ish query ``q``, ordered by BM25 relevance —
        TEXT_MATCH_WITH_LIMIT returns the N highest-SCORED hits in the
        reference (Lucene TopDocs; lucene-index-guide.md). Scorable
        terms = positive plain terms + phrase tokens (per field);
        wildcard/fuzzy terms match but score 0 (Lucene's
        constant-score rewrite, flattened). If nothing is scorable the
        cut is an arbitrary N (previous behavior). Stats come from the
        (possibly FTS-pruned) full view; the tiebreak orders by every
        column so the surviving set is engine-deterministic."""
        from .functions.text_rank import bm25_score
        # the FTS-pruned view rebind (sql()) drops files with no
        # candidate docs — fine for matching, WRONG for corpus stats:
        # Lucene's N/df/avgdl come from the whole index. Score and
        # filter over the UNPRUNED table (ranked-limit queries trade
        # file skipping for correct global statistics).
        # honor insegment()/SET carbon.input.segments scope — Lucene
        # stats then come from the scoped corpus, the searchable index
        base = (self.table(tbl).read(segments=segments)
                if self._exists(tbl) else self.spark.table(tbl))
        # under 'english', BM25 scores ANALYZED terms against the
        # analyzed token stream (stemmed tf, post-stop dl) — Lucene's
        # behavior when the field analyzer is EnglishAnalyzer
        pred = F.expr(_lucene_to_sql(q, lowercase=lc, english=eng,
                                     transpositions=trans, porter=por,
                                     porter_fast=pfast))
        by_field = self._scorable_terms(q)
        if not by_field:
            base.filter(pred).limit(n) \
                .createOrReplaceTempView("__tm_limited")
            return
        scored, score_cols = base, []
        for i, (field, terms) in enumerate(sorted(by_field.items())):
            # case folding follows the analyzer: a case-sensitive
            # (whitespace) index must not rank by case-folded tf
            pstem = (pfast[1] if por and pfast and field in pfast[0]
                     else None)
            scored = bm25_score(scored, [t for t, _ in terms],
                                boosts=[b for _, b in terms],
                                text_col=field, casefold=lc,
                                english=eng, porter=por,
                                porter_stem_sql=pstem) \
                .withColumnRenamed("bm25", f"__s{i}")
            score_cols.append(f"__s{i}")
        total = sum((F.col(c) for c in score_cols), F.lit(0.0))
        # tiebreak on every ORDERABLE column (map types can't sort —
        # a map column must not break ranked limits)
        tiebreak = [F.col(f.name) for f in base.schema.fields
                    if "map<" not in f.dataType.simpleString()]
        (scored.filter(pred)
               .withColumn("__score", total)
               .orderBy(F.col("__score").desc(), *tiebreak)
               .limit(n)
               .drop("__score", *score_cols)
               .createOrReplaceTempView("__tm_limited"))

    @staticmethod
    def _scorable_terms(q: str) -> dict[str, list[tuple[str, float]]]:
        """field → BM25-scorable (token, boost) pairs of a text_match
        query: positive (non-NOT/-) plain terms and quoted-phrase
        tokens, each with its Lucene ^boost (default 1.0); wildcard and
        fuzzy terms contribute no score (constant-score rewrite,
        flattened to 0)."""
        try:
            stashed, phrases, _rx = _stash_phrases_and_regexes(q.strip())
        except ValueError:
            return {}
        stashed, _ranges = _stash_ranges(stashed)
        toks = re.findall(r"\(|\)|[^\s()]+", stashed)
        out: dict[str, list[tuple[str, float]]] = {}
        i, skip_next = 0, False
        while i < len(toks):
            t = toks[i]
            i += 1
            if skip_next:
                skip_next = False
                if t == "(":            # NOT (group): skip whole group
                    depth = 1
                    while i < len(toks) and depth:
                        depth += {"(": 1, ")": -1}.get(toks[i], 0)
                        i += 1
                continue
            if t in ("(", ")") or t.upper() in ("AND", "OR") or t == "+":
                continue
            if t.upper() == "NOT" or t == "-":
                skip_next = True
                continue
            if t.startswith("-") and len(t) > 1 and ":" in t:
                continue                # MUST_NOT term: never scored
            tok = t.lstrip("+")
            m = re.match(r"^([\w.]+):(\S+)$", tok)
            if not m:
                continue
            field, pat = m.groups()
            pat, boost = _strip_boost(pat)
            if pm := re.fullmatch(r"\x00(\d+)\x00(?:~\d*)?", pat):
                out.setdefault(field, []).extend(
                    (tk, boost) for tk in phrases[int(pm.group(1))].split())
            elif not any(c in pat for c in "*?~\x00\x01\x02"):
                out.setdefault(field, []).append((pat, boost))
        return {f: ts for f, ts in out.items() if ts}

    def _rewrite_udf_surface(self, text: str):
        """Resolve the session-UDF surface textually before Spark parses:
        NI() unwrap, timeseries() -> date_trunc (MVFunctions.scala:28-32),
        text_match() -> RLIKE fallback, insegment() -> segment-scoped view
        (CarbonEnv.scala:100-103). All rewrites keep the expression
        JVM-side — no Python UDF in the query plan. Returns
        (text, segment_scope, fts_prune_predicates, tm_limit)."""
        from .functions.timeseries import GRANULARITIES
        text = _strip_ni(text)
        fts_preds = self._fts_prune_predicates(text)
        # the queried table's FTS analyzer steers query compilation:
        # 'standard' → case-insensitive; 'english' → case-insensitive
        # + stop-drop + stemmed term matching, matching the postings
        an = (self._fts_common_analyzer(text)
              if "text_match" in text.lower() else "whitespace")
        lc = an == "standard"
        eng = an == "english"
        por = an == "porter"
        pfast = self._porter_fast(text) if por else None
        if por:
            # registration is a cheap no-op and stays available for
            # the automaton-only regexp fallback even on the fast path
            _ensure_porter_udf(self.spark)
        if "text_match" in text.lower() and ":/" in text:
            # a regexp term MAY need the brics span matcher (nested
            # &/~ fallback) — registration is a cheap one-time no-op
            _ensure_brics_udf(self.spark)
        trans = (self._fts_fuzzy_transpositions(text)
                 if "text_match" in text.lower() else True)
        tm_limit: tuple | None = None  # (tbl, q, n, lc, eng, trans, por, pfast)
        if "text_match_with_limit" in text.lower():
            m = _TEXT_MATCH_LIMIT_SOLE.search(text)
            if not m:
                raise ValueError(
                    "text_match_with_limit must be the sole WHERE predicate "
                    "(its limit-N cut is unsound combined with other "
                    "predicates)")
            tbl, q, n, tail = m.group(1), m.group(2), int(m.group(3)), m.group(4)
            # the limited set is built as a DataFrame AFTER views are
            # (re)bound — sql() materializes __tm_limited ordered by
            # BM25 relevance (Lucene returns the top-N SCORED hits,
            # LuceneFineGrainIndex.java:63-204), falling back to an
            # arbitrary-N cut when no term is scorable
            tm_limit = (tbl, q, n, lc, eng, trans, por, pfast)
            # alias with the view-safe name — a db-qualified name is
            # not a legal alias
            alias = self._view_name(tbl) if self._exists(tbl) else tbl
            sub = f"FROM __tm_limited {alias} WHERE TRUE {tail or ''}"
            text = text[:m.start()] + sub + text[m.end():]
        text = _TEXT_MATCH_FN.sub(
            lambda m: _lucene_to_sql(m.group(1), lowercase=lc,
                                     english=eng, transpositions=trans,
                                     porter=por, porter_fast=pfast), text)

        def _ts(m: re.Match) -> str:
            from .functions.timeseries import _MINUTE_BUCKETS
            col, g = m.group(1), m.group(2).lower()
            if n := _MINUTE_BUCKETS.get(g):
                return (f"(date_trunc('hour', {col}) + make_dt_interval(0, 0, "
                        f"cast(minute({col}) / {n} as int) * {n}, 0))")
            if GRANULARITIES.get(g) is None:
                raise ValueError(f"unsupported timeseries granularity {g!r}")
            return f"date_trunc('{GRANULARITIES[g]}', {m.group(1)})"
        text = _TIMESERIES_FN.sub(_ts, text)

        seg_scope: dict[str, list[int]] = {}
        if m := _INSEGMENT_FN.search(text):
            ft = _FROM_TABLE.search(text)
            if ft and self._exists(ft.group(1)):
                seg_scope[self._canon(ft.group(1))] = [
                    int(x) for x in m.group(1).replace(",", " ").split()]
                text = _INSEGMENT_FN.sub("TRUE", text)
        return text, seg_scope, fts_preds, tm_limit

    def _fts_prune_predicates(self, text: str) -> list[tuple]:
        """If the query's single text_match() is a pure conjunction of
        positive terms (no OR/NOT anywhere that could make file pruning
        unsound), return [(field, 'text_match', [terms...])] predicates
        for the scan; else []. The RLIKE rewrite always re-evaluates
        exactly — pruning only skips files (Lucene coarse candidate set,
        reference LuceneFineGrainIndex.java:204)."""
        calls = _TEXT_MATCH_FN.findall(text)
        if len(calls) != 1:
            return []
        # OUTSIDE the call, OR/NOT make the text_match an optional
        # conjunct — pruning on it would drop rows; inside, OR is
        # handled by union postings below and NOT disables pruning.
        rest = _TEXT_MATCH_FN.sub(" ", text)
        if re.search(r"\b(OR|NOT)\b", rest, re.IGNORECASE):
            return []
        try:
            stashed, phrases = _stash_phrases(calls[0][0].strip())
        except ValueError:
            return []                   # parse error surfaces in rewrite
        if re.search(r"\bNOT\b", stashed, re.IGNORECASE):
            return []
        if "(" in stashed or ")" in stashed:
            return []                   # grouped query: decline (sound)
        if re.search(r"[\[{]\S+\s+TO\s+\S+[\]}]", stashed):
            return []                   # range term: decline (sound)
        if "\x02" in stashed or re.search(r"(?<=:)/", stashed):
            return []                   # regexp term: decline (sound)
        # implicit adjacency is Lucene's default OR — union pruning is
        # sound for ANY monotone formula of positive terms, so treat
        # every non-AND connective (explicit OR or adjacency) as OR
        raw_parts = [p for p in re.split(r"\s+", stashed) if p]
        parts, conns, pending = [], [], None
        for tok in raw_parts:
            if tok.upper() in ("AND", "OR"):
                pending = tok.upper()
                continue
            if tok.startswith(("+", "-")):
                return []               # occur bag semantics: decline
            conns.append(pending)
            parts.append(tok)
            pending = None
        has_or = any(c != "AND" for c in conns[1:])
        by_field: dict[str, list[str]] = {}
        for part in parts:
            m = re.match(r"^([\w.]+):(\S+)$", part.strip())
            if not m:
                return []
            field, pat = m.groups()
            pat, _ = _strip_boost(pat)   # ^boost never affects matching
            if pm := re.fullmatch(r"\x00(\d+)\x00(?:~\d*)?", pat):
                # phrase (sloppy or exact) → token string; pruning by
                # token-postings intersection is sound for both: any
                # row matching the phrase contains every token
                pat = phrases[int(pm.group(1))]
                if not pat.split():
                    return []
            elif "\x00" in pat:
                return []
            elif "~" in pat:
                try:
                    fz = _parse_fuzzy(pat)
                except ValueError:
                    return []           # parse error surfaces in rewrite
                if fz is None:
                    return []
                # keep 'term~N' marker — _fts_lookup expands it against
                # the term dictionary (Lucene FuzzyQuery expansion)
                pat = f"{fz[0]}~{fz[1]}"
            by_field.setdefault(field, []).append(pat)
        if has_or:
            # union pruning is sound for any AND/OR mix without NOT
            # (every matching row matches ≥1 positive term), but only
            # single-field: per-field predicates INTERSECT downstream,
            # which would be wrong across OR'd fields.
            if len(by_field) != 1:
                return []
            [(f, terms)] = by_field.items()
            return [(f, "text_match_any", terms)]
        return [(f, "text_match", terms) for f, terms in by_field.items()]

    # --------------------------------------------------------------- merge

    @staticmethod
    def _merge_equi_key(cond: str, tname: str, talias: str | None,
                        sname: str, salias: str | None) -> str | None:
        """The merge key when ON is a single same-named equi-join
        (``tgt.k = src.k`` in either order) — the shape that admits
        the source-key min/max pre-prune (operators/merge
        _source_key_preds)."""
        s = cond
        for al, rep in ((talias or tname, "tgt"),
                        (salias or sname, "src")):
            s = re.sub(rf"\b{re.escape(al)}\s*\.", f"{rep}.", s,
                       flags=re.IGNORECASE)
        m = re.fullmatch(
            r"\s*(?:tgt\.(\w+)\s*=\s*src\.(\w+)"
            r"|src\.(\w+)\s*=\s*tgt\.(\w+))\s*", s, re.IGNORECASE)
        if not m:
            return None
        a = m.group(1) or m.group(4)
        b = m.group(2) or m.group(3)
        return a if a.lower() == b.lower() else None

    def _merge_sql(self, tname: str, talias: str | None, sname: str,
                   salias: str | None, cond: str, clauses: str) -> DataFrame:
        """MERGE INTO SQL (reference ANTLR grammar CarbonSqlBase.g4:
        133-146) lowered onto the programmatic MergeBuilder. User
        aliases are rebound to the builder's internal tgt/src aliases."""
        def norm(s: str) -> str:
            for al, rep in ((talias or tname, "tgt"), (salias or sname, "src")):
                s = re.sub(rf"\b{re.escape(al)}\s*\.", f"{rep}.", s,
                           flags=re.IGNORECASE)
            return s

        def split_top(s: str) -> list[str]:
            parts, depth, cur = [], 0, []
            for ch in s:
                if ch == "," and depth == 0:
                    parts.append("".join(cur))
                    cur = []
                else:
                    depth += {"(": 1, ")": -1}.get(ch, 0)
                    cur.append(ch)
            parts.append("".join(cur))
            return [p.strip() for p in parts if p.strip()]

        b = merge_ops.merge(self.table(tname), self.table(sname).read(),
                            norm(cond),
                            key_hint=self._merge_equi_key(
                                cond, tname, talias, sname, salias))
        for neg, ccond, act in _MERGE_WHEN.findall(clauses):
            cb = (b.when_not_matched(norm(ccond) if ccond else None) if neg
                  else b.when_matched(norm(ccond) if ccond else None))
            a = act.strip().rstrip(";").strip()
            u = a.upper()
            if u == "DELETE":
                cb.delete()
            elif re.fullmatch(r"UPDATE\s+SET\s+\*", a, re.IGNORECASE):
                cb.update_all()
            elif u.startswith("UPDATE"):
                body = re.sub(r"^UPDATE\s+SET\s+", "", a, flags=re.IGNORECASE)
                sets = {}
                for kv in split_top(body):
                    k, v = kv.split("=", 1)
                    sets[k.strip().split(".")[-1]] = norm(v.strip())
                cb.update_expr(sets)
            elif re.fullmatch(r"INSERT\s+\*", a, re.IGNORECASE):
                cb.insert_all()
            elif u.startswith("INSERT"):
                mi = re.match(r"INSERT\s*\((.*?)\)\s*VALUES\s*\((.*)\)\s*$",
                              a, re.IGNORECASE | re.DOTALL)
                if not mi:
                    raise ValueError(f"cannot parse MERGE action {a!r}")
                cols = [c.strip().split(".")[-1]
                        for c in split_top(mi.group(1))]
                vals = [norm(v) for v in split_top(mi.group(2))]
                cb.insert_expr(dict(zip(cols, vals)))
            else:
                raise ValueError(f"cannot parse MERGE action {a!r}")
        st = b.execute()
        return self._df(
            [(st.updated, st.deleted, st.inserted)],
            "updated bigint, deleted bigint, inserted bigint")

    # --------------------------------------------------------------- helpers

    def _ok(self, msg: str) -> DataFrame:
        return self._df([(msg,)], "result string")

    def _parse_spjg(self, sql: str):
        """SELECT g..., aggs... FROM t [JOIN d ON t.k = d.k ...]
        [WHERE f] GROUP BY g... → pieces (None if the query isn't
        that shape). Joins are the reference MVMatcher's scope:
        inner equi-joins forming a star/snowflake off the fact
        table, keys qualified ``tbl.col`` on both sides; qualifiers
        are stripped from the remaining clauses (every column must
        be unambiguous across the join tree — the engine's managed
        tables are resolved by name)."""
        m = _SPJG.match(sql)
        if not m:
            return None
        select_items = [s.strip() for s in m.group(1).split(",")]
        table, join_text, where = m.group(2), m.group(3), m.group(4)
        group_by = [g.strip() for g in m.group(5).split(",")]
        joins: list[tuple[str, str, str]] = []
        if join_text and join_text.strip():
            tree = {table.lower()}
            for dim, lq, lc, rq, rc in _JOIN_CLAUSE.findall(join_text):
                # orient the ON sides: one qualifier must be the new
                # dim, the other a table already in the join tree
                if rq.lower() == dim.lower() and lq.lower() in tree:
                    fk, dk = lc, rc
                elif lq.lower() == dim.lower() and rq.lower() in tree:
                    fk, dk = rc, lc
                else:
                    return None
                joins.append((dim, fk, dk))
                tree.add(dim.lower())
            # strip table qualifiers from the remaining clauses so
            # the spec is canonical (columns must be unambiguous) —
            # but never inside 'string literals', where a value that
            # happens to contain "tablename." must survive verbatim
            strip = _ci(r"\b(" + "|".join(re.escape(t) for t in tree)
                        + r")\.")

            def unqualify(s: str) -> str:
                parts = re.split(r"('(?:[^']|'')*')", s)
                return "".join(p if i % 2 else strip.sub("", p)
                               for i, p in enumerate(parts))

            select_items = [unqualify(s) for s in select_items]
            group_by = [unqualify(g) for g in group_by]
            where = unqualify(where) if where else where
        aggs: dict[str, AggSpec] = {}
        plain: list[str] = []
        timeseries = None
        ts_alias = "ts_bucket"
        for item in select_items:
            if am := _AGG_ITEM.match(item):
                fn, col, alias = am.group(1).lower(), am.group(2), am.group(3)
                aggs[alias or f"{fn}({col})"] = AggSpec(fn, col)
            elif tm := _TS_ITEM.match(item):
                timeseries = (tm.group(1), tm.group(2).lower())
                ts_alias = tm.group(3) or "ts_bucket"
            elif re.fullmatch(r"\w+", item):
                plain.append(item)
            else:
                return None
        group_cols = []
        for g in group_by:
            if tm := _TS_ITEM.match(g):
                if timeseries and (tm.group(1), tm.group(2).lower()) != timeseries:
                    return None
                continue
            if not re.fullmatch(r"\w+", g):
                return None
            group_cols.append(g)
        if set(plain) - set(group_cols):
            return None
        return table, QuerySpec(group_cols, aggs, where, timeseries,
                                ts_alias, joins=joins or None)

    def _resolve_spec_joins(self, spec: QuerySpec) -> bool:
        """Replace dim NAMES from the parser with managed Table
        handles; False if any dim isn't a managed table."""
        if not spec.joins:
            return True
        if any(not self._exists(d) for d, _fk, _dk in spec.joins):
            return False
        spec.joins = [(self.table(d), fk, dk) for d, fk, dk in spec.joins]
        return True

    def _try_mv_rewrite(self, sql: str) -> DataFrame | None:
        parsed = self._parse_spjg(sql)
        if not parsed:
            return None
        table, spec = parsed
        if not self._exists(table) or not self._resolve_spec_joins(spec):
            return None
        mgr = MVManager(self.table(table))
        # cheap directory probe, NOT show(): answer() runs its own
        # show(), and doubling it would fingerprint every joined dim
        # twice per SPJG query on the SQL hot path
        if not mgr.has_mvs():
            return None
        try:
            df, _mv = mgr.answer(spec)
        except Exception:
            # fall back to direct execution on any doubt (reference
            # MVRewriteRule.scala:56-67) — e.g. a join query whose
            # unqualified columns are ambiguous across the tree only
            # under the rewrite's USING-join column layout
            return None
        return df

    def _create_mv(self, name: str, deferred: bool, select_sql: str) -> DataFrame:
        parsed = self._parse_spjg(select_sql)
        if not parsed:
            raise ValueError("MV must be a [star-join] SPJG aggregate "
                             "(same scope the reference's matcher covers)")
        table, spec = parsed
        if not self._resolve_spec_joins(spec):
            raise ValueError("MV join dims must be managed tables")
        MVManager(self.table(table)).create(
            name, spec.group_cols, list(spec.aggs.values()),
            filter=spec.filter, timeseries=spec.timeseries, deferred=deferred,
            joins=spec.joins)
        return self._ok(f"mv {name}")

    def _explain(self, select_sql: str) -> DataFrame:
        """EXPLAIN with pruning info (reference CarbonExplainCommand +
        ExplainCollector): plan text plus files-pruned counters for
        single-table filters."""
        self._register_views()
        df = self.spark.sql(self._qualify(select_sql))
        plan = df._jdf.queryExecution().toString()
        lines = [("plan", plan)]
        for name in self.tables():
            if re.search(rf"\b{name}\b", select_sql, re.IGNORECASE):
                t = self.table(name)
                total = sum(len(s.files)
                            for s in t.manifest.queryable_segments())
                lines.append((f"table.{name}.total_files", str(total)))
        return self._df(lines, "item string, value string")

    def _explain_command(self, body: str) -> DataFrame | None:
        """EXPLAIN UPDATE/DELETE/MERGE (reference CarbonExplainCommand
        + ExplainCollector — the reference explains DML commands with
        pruning info, not just SELECT): reports the driver-side
        manifest prune the mutation's touched-file discovery would
        use — files before/after, skipped count, participating
        indexes — WITHOUT executing the mutation. Returns None when
        the body isn't an engine DML (the caller falls through)."""
        kind = table = cond = None
        if m := _UPDATE_TUPLE.match(body):
            kind, table, cond = "UPDATE", m.group(1), m.group(4)
        elif (m := _UPDATE_PLAIN.match(body)) and "=" in m.group(2):
            kind, table, cond = "UPDATE", m.group(1), m.group(3)
        elif m := _DELETE.match(body):
            kind, table, cond = "DELETE", m.group(1), m.group(2)
        merge_m = None
        if kind is None and (m := _MERGE.match(body)):
            kind, table, merge_m = "MERGE", m.group(1), m
        if kind is None or not self._exists(table):
            return None
        t = self.table(table)
        preds = parse_simple_condition(cond) if cond else None
        if merge_m is not None and self._exists(merge_m.group(3)):
            # mirror the runtime prune: equi-key merges pre-prune the
            # target scan with the source key min/max
            # (operators/merge._source_key_preds) — the static
            # explain applies the same bound when the source relation
            # is resolvable, instead of over-stating files.candidate
            key = self._merge_equi_key(
                merge_m.group(5), table, merge_m.group(2),
                merge_m.group(3), merge_m.group(4))
            if key:
                # EXPLAIN stays plan-only: source key bounds come
                # from the source table's OWN manifest min/max stats
                # (no Spark job). Only when the metadata can't answer
                # (mor deltas pending, statless/non-numeric column)
                # do we fall back to a real min/max aggregate, and
                # then only under a row-count ceiling so explaining a
                # MERGE against a huge source never launches a
                # scan-level job.
                src_t = self.table(merge_m.group(3))
                mm_meta = src_t.manifest.minmax_metadata([key])
                lo = hi = None
                # rows=-1 sentinels (statless csv/json externals)
                # would make row_count() an undercount — treat the
                # cap as unanswerable then, mirroring Table.count's
                # guard (catalog/table.py), instead of letting a
                # huge statless table slip under the ceiling
                src_rows_known = not any(
                    f.rows < 0
                    for s in src_t.manifest.queryable_segments()
                    for f in s.files)
                if mm_meta is not None:
                    lo, hi = mm_meta.get(key, (None, None))
                elif src_rows_known and src_t.manifest.row_count() \
                        <= self._EXPLAIN_SCAN_ROW_CAP:
                    r = (src_t.read()
                         .agg(F.min(key).alias("lo"),
                              F.max(key).alias("hi")).first())
                    lo, hi = r["lo"], r["hi"]
                if lo is not None:
                    cond = f"{key} BETWEEN {lo} AND {hi}"
                    preds = [(key, "between", (lo, hi))]
        total = sum(len(s.files) for s in t.manifest.queryable_segments())
        kept = sum(len(v) for v in t.scan_files(preds).values())
        pred_cols = {p[0] for p in (preds or [])}
        idx = ([i["name"] for i in t.indexes.show()
                if set(i.get("columns", [])) & pred_cols]
               if pred_cols else [])
        lines = [
            ("command", kind),
            ("table", self._canon(table)),
            ("condition", (cond or "true").strip()),
            ("pushed_predicates", str(preds or [])),
            ("files.total", str(total)),
            ("files.candidate", str(kept)),
            ("files.skipped", str(total - kept)),
            ("indexes.participating", ",".join(idx) or "(none)"),
            ("executed", "false"),
        ]
        return self._df(lines, "item string, value string")

    def _describe_column(self, table: str, path: str) -> DataFrame:
        """DESCRIBE COLUMN col[.child...] ON table: drill into complex
        types, listing the children of the addressed field (reference
        CarbonDescribeColumnCommand)."""
        from pyspark.sql.types import ArrayType, MapType, StructType
        dtype = self.table(table)._schema_struct()
        walked = []
        for part in path.split("."):
            if isinstance(dtype, ArrayType):
                dtype = dtype.elementType
            if not isinstance(dtype, StructType) \
                    or part not in dtype.fieldNames():
                raise ValueError(
                    f"column {'.'.join(walked + [part])!r} not found "
                    f"in {table}")
            dtype = dtype[part].dataType
            walked.append(part)
        rows = []
        if isinstance(dtype, StructType):
            rows = [(f.name, f.dataType.simpleString(), "struct child")
                    for f in dtype.fields]
        elif isinstance(dtype, ArrayType):
            rows = [("item", dtype.elementType.simpleString(),
                     "array element")]
        elif isinstance(dtype, MapType):
            rows = [("key", dtype.keyType.simpleString(), "map key"),
                    ("value", dtype.valueType.simpleString(), "map value")]
        else:
            rows = [(path, dtype.simpleString(), "primitive")]
        return self._df(rows, "col_name string, data_type string, "
                              "comment string")

    def _describe_short(self, name: str) -> DataFrame:
        """DESCRIBE SHORT: top-level columns only, complex types
        abbreviated to their container kind (reference
        CarbonDescribeShortCommand)."""
        from pyspark.sql.types import ArrayType, MapType, StructType
        struct = self.table(name)._schema_struct()
        short = {StructType: "struct<...>", ArrayType: "array<...>",
                 MapType: "map<...>"}
        rows = [(f.name,
                 short.get(type(f.dataType), f.dataType.simpleString()), "")
                for f in struct.fields]
        return self._df(rows, "col_name string, data_type string, "
                              "comment string")

    def _describe(self, name: str, formatted: bool) -> DataFrame:
        t = self.table(name)
        struct = t._schema_struct()
        rows = [(f.name, f.dataType.simpleString(), "") for f in struct.fields]
        if formatted:
            doc = t.manifest.load()
            rows += [("", "", ""),
                     ("# Detailed Table Information", "", "")]
            rows += [("Location", t.table_dir, ""),
                     ("Table Properties", str(doc.get("properties", {})), ""),
                     ("Segments", str(len(doc["segments"])), ""),
                     ("Rows", str(t.count()), "")]
            deltas = doc.get("delete_deltas") or []
            if deltas:
                rows += [("Delete Deltas", str(len(deltas)),
                          "merge-on-read sidecars pending compaction"),
                         ("Deleted Rows", str(sum(d["rows"] for d in deltas)),
                          "subtracted at read time")]
        return self._df(rows, "col_name string, data_type string, comment string")
