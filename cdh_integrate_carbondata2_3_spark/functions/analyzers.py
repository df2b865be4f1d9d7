"""Text analyzers for the FTS surface — the 'english' analyzer's
stemmer + stop list, defined ONCE as data/rules and emitted twice:
as Python (postings build normalization, query-term analysis) and as
an engine-portable SQL fragment (the exact-refine predicate in Spark
SQL and the DuckDB gate oracles share it verbatim).

Reference surface: the Lucene fine-grain index configures an analyzer
per index (reference docs/index/lucene-index-guide.md; analyzer
pipeline in index/lucene/.../LuceneFineGrainIndex.java:63-204).
Lucene's EnglishAnalyzer = StandardTokenizer → lowercase → stop
filter → Porter stemmer. This engine ships:

- the standard 33-word English stop set (the classic Lucene/Snowball
  default list — public, stable since the SMART system);
- the minimal English "s-stemmer" (Donna Harman, "How effective is
  suffixing?", JASIS 1991 — the plural-only stemmer Lucene exposes as
  EnglishMinimalStemFilter), chosen over full Porter because it is
  faithfully expressible as ONE portable SQL CASE expression, so the
  refine predicate stays JVM-side (no Python UDF) and a DuckDB oracle
  can replay matching bit-for-bit. Porter's derivational steps
  (-ational, -iveness, m>0 measure conditions) remain a documented
  delta (COVERAGE.md).

Pipeline order matches Lucene: lowercase → stop-remove (on the
SURFACE form) → stem. A stopword is judged before stemming, so
"thes" (not a stopword) survives and stems to "the" — both emitters
agree because they share the rule order.
"""

from __future__ import annotations

# The classic English stop set (SMART-derived; Lucene's
# EnglishAnalyzer default). Kept sorted for deterministic SQL.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

_STOPS_SET = frozenset(ENGLISH_STOPWORDS)


def is_stopword(token: str) -> bool:
    """Stop check on the lowercased SURFACE form (pre-stem, as in
    Lucene's pipeline order)."""
    return token in _STOPS_SET


def minimal_stem(w: str) -> str:
    """Harman's s-stemmer: strip plural -s with three guard rules.
    Mirrors :func:`stem_sql` exactly — change both together.

    - words shorter than 3 chars, or not ending in 's', pass through;
    - -us / -ss endings pass through (bus, class);
    - -ies → -y unless preceded by a/e (ties → ty, but aes-like
      endings pass), other -Ves endings pass when V ∈ {i,a,o,e}
      (goes, sees), else the final s drops (makes → make);
    - otherwise the final s drops (dogs → dog).
    """
    if len(w) < 3 or not w.endswith("s"):
        return w
    if w[-2] in ("u", "s"):
        return w
    if w[-2] == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
        return w[:-1]
    return w[:-1]


def stem_sql(t: str) -> str:
    """The s-stemmer as a SQL CASE over expression ``t`` — valid in
    BOTH Spark SQL and DuckDB (length/substr/right/||/IN only; every
    substr position is guarded ≥ 1 so the two engines' clamping
    differences can't diverge). Mirrors :func:`minimal_stem`."""
    return (
        f"CASE WHEN length({t}) < 3 OR right({t}, 1) <> 's' THEN {t} "
        f"WHEN substr({t}, length({t}) - 1, 1) IN ('u', 's') THEN {t} "
        f"WHEN substr({t}, length({t}) - 1, 1) = 'e' THEN "
        f"CASE WHEN length({t}) > 3 "
        f"AND substr({t}, length({t}) - 2, 1) = 'i' "
        f"AND substr({t}, length({t}) - 3, 1) NOT IN ('a', 'e') "
        f"THEN substr({t}, 1, length({t}) - 3) || 'y' "
        f"WHEN substr({t}, length({t}) - 2, 1) IN ('i', 'a', 'o', 'e') "
        f"THEN {t} "
        f"ELSE substr({t}, 1, length({t}) - 1) END "
        f"ELSE substr({t}, 1, length({t}) - 1) END")


def stops_sql() -> str:
    """The stop set as a SQL IN-list body: 'a', 'an', ..."""
    return ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance (insert/delete/substitute) — the
    Python twin of SQL ``levenshtein`` for the porter-analyzer fuzzy
    refine with 'fuzzy_transpositions'='false'."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau–Levenshtein distance (adjacent
    transposition costs ONE edit and the transposed pair may be
    re-edited) — the same distance DuckDB's ``damerau_levenshtein``
    computes and the one sql.py's _dam_pred_sql decomposition is
    property-tested against, so the porter-analyzer fuzzy refine
    (which runs in Python, no SQL form for the stemmer) agrees with
    the english/whitespace SQL paths. Classic DP with the last-seen
    character table (Lowrance & Wagner 1975)."""
    la, lb = len(a), len(b)
    if not la or not lb:
        return la or lb
    inf = la + lb
    da: dict[str, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,             # substitute / match
                d[i + 1][j] + 1,            # insert
                d[i][j + 1] + 1,            # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1))  # transpose
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def analyze_term(term: str) -> str | None:
    """Analyze ONE query term the way the index analyzed the corpus:
    lowercase → None if stopword (Lucene's QueryParser drops the
    clause) → stem."""
    t = term.lower()
    if is_stopword(t):
        return None
    return minimal_stem(t)
