"""The Porter stemming algorithm (M.F. Porter, "An algorithm for
suffix stripping", Program 14(3), 1980) — the stemmer Lucene's
EnglishAnalyzer applies via PorterStemFilter.

This is the CANONICAL variant (Porter's reference porter.c, which
Lucene's PorterStemmer.java copies), including its two documented
departures from the published paper:

- step 2 maps the suffix ``bli`` → ``ble`` (the paper had
  ``abli`` → ``able``);
- step 2 adds ``logi`` → ``log``.

Unlike the s-stemmer (functions/analyzers.py), Porter's measure
conditions (m > 0, *v*, *d, *o) are not expressible as one portable
SQL CASE, so the 'porter' analyzer evaluates its refine predicate
through an Arrow-batched pandas UDF (sql.py) and its gate query takes
the rows-only correctness check — the stemmer itself is verified
against the algorithm's published example vocabulary in
tests/test_porter.py.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    n = len(w)
    return (n >= 3 and _is_cons(w, n - 3) and not _is_cons(w, n - 2)
            and _is_cons(w, n - 1) and w[-1] not in "wxy")


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If ``w`` ends with ``suffix`` and the remaining stem has
    measure > ``min_m``, apply the replacement; None = no match (try
    the next rule), w unchanged = matched but condition failed
    (STOP trying rules in this step, per the algorithm: the longest
    matching suffix decides)."""
    if not w.endswith(suffix):
        return None
    stem = w[:-len(suffix)] if suffix else w
    if _measure(stem) > min_m:
        return stem + repl
    return w


def porter_stem(word: str) -> str:
    """Stem one lowercase word."""
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _step1b_cleanup(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _step1b_cleanup(w)

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (longest-match by suffix; porter.c departures noted)
    for suffix, repl in (
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"),
            ("bli", "ble"),                      # departure: paper had abli
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble"),
            ("logi", "log")):                    # departure: porter.c adds
        out = _replace(w, suffix, repl, 0)
        if out is not None:
            w = out
            break

    # ---- step 3
    for suffix, repl in (
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")):
        out = _replace(w, suffix, repl, 0)
        if out is not None:
            w = out
            break

    # ---- step 4 (m > 1 drops the suffix; (s|t)ion guard)
    for suffix in ("al", "ance", "ence", "er", "ic", "able", "ible",
                   "ant", "ement", "ment", "ent", "ion", "ou", "ism",
                   "ate", "iti", "ous", "ive", "ize"):
        if w.endswith(suffix):
            stem = w[:-len(suffix)]
            if suffix == "ion" and not (stem and stem[-1] in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # ---- step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _step1b_cleanup(w: str) -> str:
    """After removing -ed/-ing: restore e, undouble, or pad cvc."""
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _ends_cvc(w):
        return w + "e"
    return w


def porter_analyze(token: str) -> str | None:
    """Analyze one token the 'porter' analyzer way: lowercase →
    stop-remove (same classic stop set as 'english') → Porter stem.
    None = stopword (clause/token dropped)."""
    from .analyzers import is_stopword
    t = token.lower()
    if is_stopword(t):
        return None
    return porter_stem(t)


def porter_stream(text: str) -> list[str | None]:
    """Analyze a whole text the 'porter' analyzer way, keeping
    Lucene's StopFilter POSITION GAPS (enablePositionIncrements=true):
    each whitespace token maps to its stem, but a stopword occupies
    its position emitting nothing (None) — the same gapped stream
    sql.py's _english_phrase_sql builds in SQL for the s-stemmer.
    Phrase/positional porter predicates match against this."""
    from .analyzers import is_stopword
    return [None if is_stopword(t) else porter_stem(t)
            for t in text.lower().split()]


def stem_case_sql(var: str, words) -> str:
    """The Porter stem of a FIXED vocabulary as a closed SQL CASE over
    expression ``var`` — how a DuckDB gate oracle replays Porter
    matching without a stemmer UDF. Porter's measure conditions have
    no general SQL form, but over a finite known vocabulary the
    function IS its value table. The dictionary is generated from
    :func:`porter_stem` (verified against Porter's published example
    vocabulary in tests/test_porter.py), so the oracle independently
    checks everything EXCEPT the stemmer: tokenization, stop gaps,
    position logic, edit distances, BM25 arithmetic. Callers must
    cover the corpus vocabulary (tests/test_analyzers.py pins the
    testdata vocab against the gate's word list so drift fails loudly
    instead of silently falling through to the ELSE-identity arm)."""
    pairs = sorted({w.lower() for w in words})
    whens = " ".join(
        f"WHEN '{w}' THEN '{porter_stem(w)}'"
        for w in pairs if porter_stem(w) != w and "'" not in w)
    if not whens:
        return var
    return f"(CASE {var} {whens} ELSE {var} END)"
