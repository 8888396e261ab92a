"""Surround query language — the Lucene queryparser-surround module
(org.apache.lucene.queryparser.surround): the span-oriented query syntax
whose W/N operators compile to SpanNearQuery (ordered/unordered).

Supported grammar (the module's core; documented subset — everything else
is a loud :class:`SurroundParseError`):

* ``a W b`` / ``a 3W b`` — ordered proximity, infix; the number is the
  Lucene surround DISTANCE (opsDistance): ``nW`` means the spans fit in a
  window of n positions, i.e. span slop = n − 1 (``W`` alone = distance 1
  = adjacency, slop 0).  Chains associate left: ``a W b W c`` is one
  3-term ordered near.
* ``a N b`` / ``a 4N b`` — unordered proximity, same distance convention.
* ``nW(a, b, …)`` / ``nN(a, b, …)`` — prefix forms (≥ 2 args).
* ``AND`` / ``OR`` / ``NOT`` (case-insensitive) with the surround
  precedence NOT < AND < OR?  — no: the module binds OR loosest, then
  AND, then NOT, then W/N tightest; parentheses group.
* bare terms (analyzed; a term that analyzes to ≠ 1 token — stop word,
  punctuation — is a loud error, exactly like the span API).

Output: a list of top-level clauses for the boolean evaluator —
TermClause / SpanClause / GroupClause trees (SHOULD for OR branches,
MUST/MUST_NOT inside AND/NOT groups), scored by the engine's ordinary
similarity (spans as pseudo-terms).  Wildcards/truncations (``a*``,
``a?``) from the full surround language are rejected loudly — the span
engine evaluates term spans.
"""

from __future__ import annotations

import re

from lucene_plugin_ray.functions.queryparse import (
    MUST,
    MUST_NOT,
    SHOULD,
    GroupClause,
    SpanClause,
    TermClause,
)


class SurroundParseError(ValueError):
    """Raised for syntax outside the supported surround subset."""


_TOKEN_RE = re.compile(
    r"\s*(\(|\)|,|(?P<dist>\d*)(?P<op>[wWnN])\b(?=\s*\()"  # prefix nW( / nN(
    r"|(?P<word>[^\s(),]+))"
)


def _tokenize(src: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise SurroundParseError(
                f"unrecognized surround syntax at {src[i:]!r}"
            )
        i = m.end()
        tok = m.group(0).strip()
        if not tok:
            break
        if tok in ("(", ")", ","):
            out.append((tok, None))
        elif m.group("op") is not None:
            dist = int(m.group("dist") or 1)
            out.append(
                ("PREFIX_OP", (m.group("op").lower(), dist))
            )
        else:
            word = m.group("word")
            up = word.upper()
            if up in ("AND", "OR", "NOT"):
                out.append((up, None))
                continue
            # infix nW / nN between operands: a bare word of the shape
            # digits?+w|n is an operator ONLY in infix position — the
            # parser decides; emit a dual-reading token
            im = re.fullmatch(r"(\d*)([wWnN])", word)
            if im is not None:
                out.append(
                    ("WORD_OR_INFIX",
                     (word, im.group(2).lower(), int(im.group(1) or 1)))
                )
            else:
                out.append(("WORD", word))
    return out


def _analyzed_term(word: str) -> str:
    from lucene_plugin_ray.functions.analysis import analyze

    if any(ch in word for ch in "*?"):
        raise SurroundParseError(
            f"surround truncation {word!r} is not supported (term spans "
            "only)"
        )
    toks = analyze(word)
    if len(toks) != 1:
        raise SurroundParseError(
            f"surround term {word!r} must analyze to exactly one index "
            f"token, got {toks!r}"
        )
    return toks[0]


class _Parser:
    def __init__(self, tokens: list, field: str):
        self.toks = tokens
        self.i = 0
        self.field = field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # OR (loosest)
    def parse_or(self):
        legs = [self.parse_and()]
        while self.peek()[0] == "OR":
            self.take()
            legs.append(self.parse_and())
        return legs[0] if len(legs) == 1 else ("or", legs)

    def parse_and(self):
        legs = [self.parse_not()]
        while self.peek()[0] == "AND":
            self.take()
            legs.append(self.parse_not())
        return legs[0] if len(legs) == 1 else ("and", legs)

    def parse_not(self):
        left = self.parse_prox()
        while self.peek()[0] == "NOT":
            self.take()
            right = self.parse_prox()
            left = ("not", [left, right])
        return left

    # W/N (tightest): chains of atoms joined by infix operators
    def parse_prox(self):
        terms = [self.parse_atom()]
        ops: list[tuple[str, int]] = []
        while True:
            kind, val = self.peek()
            if kind == "WORD_OR_INFIX":
                # operator reading only when another operand follows
                save = self.i
                self.take()
                nxt = self.peek()[0]
                if nxt in ("WORD", "WORD_OR_INFIX", "(", "PREFIX_OP"):
                    ops.append((val[1], val[2]))
                    terms.append(self.parse_atom())
                    continue
                self.i = save
            break
        if not ops:
            return terms[0]
        # a W b W c folds into ONE near over the chain; mixing W and N or
        # mixing distances in one chain is ambiguous — loud
        kinds = {k for k, _ in ops}
        dists = {d for _, d in ops}
        if len(kinds) != 1 or len(dists) != 1:
            raise SurroundParseError(
                "mixed W/N operators or distances in one proximity chain "
                "are ambiguous — parenthesize"
            )
        for t in terms:
            if not isinstance(t, str):
                raise SurroundParseError(
                    "W/N operands must be plain terms (the span engine "
                    "evaluates unit term spans)"
                )
        op, dist = ops[0]
        return ("near", op == "w", dist, terms)

    def parse_atom(self):
        kind, val = self.take()
        if kind == "(":
            inner = self.parse_or()
            if self.take()[0] != ")":
                raise SurroundParseError("unbalanced '(' in surround query")
            return inner
        if kind == "PREFIX_OP":
            op, dist = val
            if self.take()[0] != "(":
                raise SurroundParseError(f"{op}{dist}: expected '('")
            args = [self.parse_atom()]
            while self.peek()[0] == ",":
                self.take()
                args.append(self.parse_atom())
            if self.take()[0] != ")":
                raise SurroundParseError("unbalanced '(' in prefix W/N")
            if len(args) < 2:
                raise SurroundParseError("prefix W/N needs >= 2 arguments")
            for a in args:
                if not isinstance(a, str):
                    raise SurroundParseError(
                        "W/N arguments must be plain terms"
                    )
            return ("near", op == "w", dist, args)
        if kind == "WORD":
            return _analyzed_term(val)
        if kind == "WORD_OR_INFIX":
            return _analyzed_term(val[0])
        raise SurroundParseError(
            f"unexpected token {kind or 'end-of-query'!r} in surround query"
        )


def _to_clause(node, occur: str, field: str):
    """AST → clause tree under the boolean evaluator's semantics."""
    if isinstance(node, str):
        return TermClause(occur, field, node)
    tag = node[0]
    if tag == "near":
        _, ordered, dist, terms = node
        if dist < 1:
            raise SurroundParseError("W/N distance must be >= 1")
        if not ordered and len(set(terms)) != len(terms):
            raise SurroundParseError(
                "unordered N with repeated terms is not supported"
            )
        return SpanClause(
            occur=occur, field=field, kind="near", terms=tuple(terms),
            slop=dist - 1, in_order=ordered,
        )
    if tag == "or":
        return GroupClause(
            occur,
            tuple(_to_clause(leg, SHOULD, field) for leg in node[1]),
        )
    if tag == "and":
        return GroupClause(
            occur,
            tuple(_to_clause(leg, MUST, field) for leg in node[1]),
        )
    if tag == "not":
        left, right = node[1]
        return GroupClause(
            occur,
            (_to_clause(left, MUST, field),
             _to_clause(right, MUST_NOT, field)),
        )
    raise SurroundParseError(f"internal: unknown node {tag!r}")


def parse_surround(query: str, field: str) -> list:
    """Parse a surround-language query → top-level clause list for
    :meth:`SearchEngine._execute` (one SHOULD clause; the boolean
    structure lives in nested groups)."""
    if not isinstance(query, str) or not query.strip():
        raise SurroundParseError("empty surround query")
    toks = _tokenize(query.strip())
    p = _Parser(toks, field)
    ast = p.parse_or()
    if p.i != len(p.toks):
        raise SurroundParseError(
            f"trailing tokens in surround query at position {p.i}"
        )
    return [_to_clause(ast, SHOULD, field)]
