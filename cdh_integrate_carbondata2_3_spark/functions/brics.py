"""Full Lucene/brics regexp evaluation — including the operators a
Java/RE2 regex CANNOT express: nested intersection ``&`` and the
(deprecated but still parsed) complement ``~``.

Lucene's RegexpQuery parses the brics ``RegExp`` dialect
(org.apache.lucene.util.automaton.RegExp) and compiles it to an
automaton; intersection and complement are closed under automata but
not under PCRE-style regexes, which is why sql.py's
``_lucene_regex_to_java`` translator (the fast path — the pattern
runs as an RLIKE inside whole-stage codegen) supports ``&`` only at
the top level and raises on ``~``. This module is the slow-path twin:
a span-set matcher over a small AST, used by an Arrow-batched UDF
ONLY for patterns the translator rejects, so the Python cost is
opted into per query, never paid by translatable patterns.

Matching is whole-token (Lucene anchors regexps to the term). The
span-set evaluator computes, for node and start position, the set of
end positions — intersection is set-intersection, complement is the
set-difference against every possible end — with memoization, so
worst-case cost is polynomial in token length (tokens are words;
length is tens of characters).

Dialect parity with the translator (same grammar, one parser each,
cross-checked in tests/test_analyzers.py on translatable patterns):
``|`` union, ``&`` intersection (any nesting), ``~`` complement,
``?``/``*``/``+``/``{n}``/``{n,}``/``{n,m}`` repetition, ``.`` any
char, ``@`` any string, ``#`` empty language, ``[...]``/``[^...]``
classes with ranges, ``"..."`` quoted literal, ``<n-m>`` numeric
interval (brics semantics: width between the operand widths, value
in range — leading zeros accepted when widths differ), ``\\x``
escape-as-literal, ``()`` empty string, ``(...)`` grouping.
Reference: Lucene RegExp.java (brics syntax), via RegexpQuery in
LuceneFineGrainIndex.java:63-204.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------- AST

# Nodes are tuples (tag, *payload) — hashable, cheap to memoize on.
# ("lit", ch) ("any",) ("anystr",) ("empty",) ("eps",)
# ("class", frozenset, negated) ("cat", a, b) ("or", a, b)
# ("and", a, b) ("not", a) ("star", a) ("rep", a, lo, hi|None)
# ("ival", lo_str, hi_str)


class BricsSyntaxError(ValueError):
    pass


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def _take(self) -> str:
        c = self._peek()
        self.i += 1 if c else 0
        return c

    def parse(self):
        node = self._union()
        if self.i != len(self.s):
            raise BricsSyntaxError(
                f"brics: trailing input at ...{self.s[self.i:]!r}")
        return node

    def _union(self):
        node = self._inter()
        while self._peek() == "|":
            self._take()
            node = ("or", node, self._inter())
        return node

    def _inter(self):
        node = self._concat()
        while self._peek() == "&":
            self._take()
            node = ("and", node, self._concat())
        return node

    def _concat(self):
        parts = []
        while self._peek() not in ("", "|", "&", ")"):
            parts.append(self._repeat())
        if not parts:
            return ("eps",)
        node = parts[0]
        for p in parts[1:]:
            node = ("cat", node, p)
        return node

    def _repeat(self):
        node = self._atom()
        while True:
            c = self._peek()
            if c == "?":
                self._take()
                node = ("rep", node, 0, 1)
            elif c == "*":
                self._take()
                node = ("star", node)
            elif c == "+":
                self._take()
                node = ("cat", node, ("star", node))
            elif c == "{":
                j = self.s.find("}", self.i)
                if j < 0:
                    raise BricsSyntaxError(
                        f"brics: unbalanced {{ in /{self.s}/")
                body = self.s[self.i + 1:j]
                self.i = j + 1
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo = int(lo_s)
                    hi = int(hi_s) if hi_s else None
                else:
                    lo = hi = int(body)
                if hi is None:
                    # {n,} = exactly-n then star, built at parse time
                    # so the matcher never allocates transient nodes
                    # (memoization keys on node identity)
                    node = ("cat", ("rep", node, lo, lo),
                            ("star", node))
                else:
                    if lo > hi:
                        # Lucene's brics RegExp rejects {n,m} with
                        # n > m; the RLIKE translator path fails at
                        # Java-regex compile — reject identically here
                        raise BricsSyntaxError(
                            f"brics: bad interval {{{lo},{hi}}} "
                            f"(min > max) in /{self.s}/")
                    node = ("rep", node, lo, hi)
            else:
                return node

    def _atom(self):
        c = self._take()
        if c == "":
            raise BricsSyntaxError(f"brics: unexpected end in /{self.s}/")
        if c == "(":
            if self._peek() == ")":
                self._take()
                return ("eps",)
            inner = self._union()
            if self._take() != ")":
                raise BricsSyntaxError(
                    f"brics: unbalanced parens in /{self.s}/")
            return inner
        if c == "~":
            return ("not", self._repeat())
        if c == "[":
            return self._char_class()
        if c == ".":
            return ("any",)
        if c == "@":
            return ("anystr",)
        if c == "#":
            return ("empty",)
        if c == '"':
            j = self.s.find('"', self.i)
            if j < 0:
                raise BricsSyntaxError(
                    f"brics: unterminated \" in /{self.s}/")
            lit = self.s[self.i:j]
            self.i = j + 1
            node = ("eps",)
            for ch in lit:
                node = ("cat", node, ("lit", ch))
            return node
        if c == "<":
            j = self.s.find(">", self.i)
            m = self.s[self.i:j] if j >= 0 else ""
            parts = m.split("-")
            if j < 0 or len(parts) != 2 or not all(
                    p.isdigit() for p in parts):
                raise BricsSyntaxError(
                    f"brics: bad interval at ...<{self.s[self.i:]!r}")
            self.i = j + 1
            return ("ival", parts[0], parts[1])
        if c == "\\":
            nxt = self._take()
            if nxt == "":
                raise BricsSyntaxError(
                    f"brics: trailing backslash in /{self.s}/")
            return ("lit", nxt)
        return ("lit", c)

    def _char_class(self):
        neg = False
        if self._peek() == "^":
            self._take()
            neg = True
        members: set[str] = set()
        first = True
        while True:
            c = self._take()
            if c == "":
                raise BricsSyntaxError(
                    f"brics: unterminated [ in /{self.s}/")
            if c == "]" and not first:
                return ("class", frozenset(members), neg)
            first = False
            if c == "\\":
                c = self._take()
                if c == "":
                    raise BricsSyntaxError(
                        f"brics: trailing backslash in /{self.s}/")
            lo = c
            if (self._peek() == "-"
                    and self.s[self.i + 1:self.i + 2] not in ("", "]")):
                self._take()
                hi = self._take()
                if hi == "\\":
                    hi = self._take()
                for o in range(ord(lo), ord(hi) + 1):
                    members.add(chr(o))
            else:
                members.add(lo)


# ------------------------------------------------------------- matcher

def _ival_ok(s: str, lo: str, hi: str) -> bool:
    """brics IntervalNode semantics, matching the translator's
    _interval_regex exactly: decimal digits with value in [lo, hi];
    equal operand widths fix the token width (Lucene digits=N), while
    differing widths accept ANY number of leading zeros (digits=0 —
    the translator emits 0*(...) and the regexp-dialect gate pinned
    that behavior)."""
    if not s or not s.isdigit():
        return False
    if len(lo) == len(hi) and len(s) != len(lo):
        return False
    return int(lo) <= int(s) <= int(hi)


def _spans(node, s: str, i: int, memo: dict) -> frozenset:
    """End positions j >= i such that s[i:j] matches ``node``."""
    key = (id(node), i)
    got = memo.get(key)
    if got is not None:
        return got
    memo[key] = frozenset()          # cycle guard (star recursion)
    tag = node[0]
    n = len(s)
    if tag == "lit":
        out = frozenset((i + 1,)) if i < n and s[i] == node[1] \
            else frozenset()
    elif tag == "any":
        out = frozenset((i + 1,)) if i < n else frozenset()
    elif tag == "anystr":
        out = frozenset(range(i, n + 1))
    elif tag == "empty":
        out = frozenset()
    elif tag == "eps":
        out = frozenset((i,))
    elif tag == "class":
        _, members, neg = node
        hit = i < n and ((s[i] in members) != neg)
        out = frozenset((i + 1,)) if hit else frozenset()
    elif tag == "cat":
        out = frozenset(
            j for m in _spans(node[1], s, i, memo)
            for j in _spans(node[2], s, m, memo))
    elif tag == "or":
        out = _spans(node[1], s, i, memo) | _spans(node[2], s, i, memo)
    elif tag == "and":
        out = _spans(node[1], s, i, memo) & _spans(node[2], s, i, memo)
    elif tag == "not":
        out = frozenset(range(i, n + 1)) - _spans(node[1], s, i, memo)
    elif tag == "star":
        seen = {i}
        frontier = [i]
        while frontier:
            nxt = []
            for m in frontier:
                for j in _spans(node[1], s, m, memo):
                    if j not in seen and j > m:
                        seen.add(j)
                        nxt.append(j)
            frontier = nxt
        out = frozenset(seen)
    elif tag == "rep":
        _, inner, lo, hi = node   # hi always an int ({n,} is parsed
        cur = frozenset((i,))     # into exactly-n · star)
        for _ in range(lo):
            cur = frozenset(
                j for m in cur for j in _spans(inner, s, m, memo))
        acc = set(cur)
        for _ in range(hi - lo):
            cur = frozenset(
                j for m in cur for j in _spans(inner, s, m, memo))
            acc |= cur
        out = frozenset(acc)
    elif tag == "ival":
        _, lo, hi = node
        out = frozenset(
            j for j in range(i + 1, n + 1) if _ival_ok(s[i:j], lo, hi))
    else:  # pragma: no cover
        raise AssertionError(tag)
    memo[key] = out
    return out


@lru_cache(maxsize=256)
def brics_compile(pattern: str):
    """Parse once per distinct pattern (cached)."""
    return _Parser(pattern).parse()


def brics_match(pattern: str, token: str) -> bool:
    """Whole-token match of a brics regexp (Lucene anchors regexps to
    the full term)."""
    node = brics_compile(pattern)
    return len(token) in _spans(node, token, 0, {})
