"""Boolean query language over the inverted index: a recursive-descent
parser for ``AND`` / ``OR`` / ``NOT`` / parentheses / ``"quoted
phrases"`` with implicit AND on adjacency, compiled onto the engine's
set primitives (``search_and`` / ``search_or`` / ``search_phrase``,
``query/engine.py:478-668``).

Grammar (standard search-box syntax)::

    expr    := and_expr (OR and_expr)*
    and_expr:= unary (AND? unary)*        # bare adjacency means AND
    unary   := NOT unary | primary
    primary := '(' expr ')' | '"..."' | TERM

Semantics:

- a TERM evaluates to the doc set of its analyzed tokens ANDed (the
  reference's single-keyword behavior: one input word can analyze into
  several index tokens),
- NOT is only meaningful inside a conjunction with at least one positive
  conjunct (``a AND NOT b``) — a query whose top level is purely
  negative raises ``ValueError`` rather than materializing the full
  corpus complement (the standard search-engine restriction; at 100 TB
  a complement IS a corpus scan),
- evaluation order inside a conjunction: positives first (ascending by
  candidate size thanks to the engine's AND loop), negatives subtracted
  from the accumulated positive set, so a negative term's postings are
  only intersected against an already-small candidate list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_TOKEN_RE = re.compile(r'\(|\)|"[^"]*"|[^\s()]+')


# ------------------------------------------------------------------- AST


@dataclass
class Term:
    text: str


@dataclass
class Phrase:
    text: str


@dataclass
class Not:
    child: object


@dataclass
class And:
    children: list


@dataclass
class Or:
    children: list


# ----------------------------------------------------------------- parser


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_expr(self):
        node = self.parse_and()
        children = [node]
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            children.append(self.parse_and())
        return children[0] if len(children) == 1 else Or(children)

    def parse_and(self):
        children = [self.parse_unary()]
        while True:
            t = self.peek()
            if t is None or t == ")" or t.upper() == "OR":
                break
            if t.upper() == "AND":
                self.next()
                t = self.peek()
                if t is None or t == ")" or t.upper() in ("AND", "OR"):
                    raise ValueError("dangling AND")
            children.append(self.parse_unary())
        return children[0] if len(children) == 1 else And(children)

    def parse_unary(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t.upper() == "NOT":
            self.next()
            return Not(self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        t = self.next()
        if t == "(":
            node = self.parse_expr()
            if self.peek() != ")":
                raise ValueError("unbalanced parenthesis")
            self.next()
            return node
        if t == ")":
            raise ValueError("unexpected ')'")
        if t.startswith('"'):
            return Phrase(t.strip('"'))
        if t.upper() in ("AND", "OR", "NOT"):
            raise ValueError(f"operator {t!r} in term position")
        return Term(t)


def parse_query(query: str):
    """Query string → AST. Raises ValueError on malformed input."""
    tokens = _TOKEN_RE.findall(query)
    if not tokens:
        raise ValueError("empty query")
    p = _Parser(tokens)
    node = p.parse_expr()
    if p.peek() is not None:
        raise ValueError(f"trailing input at {p.peek()!r}")
    return node


# -------------------------------------------------------------- evaluator


def evaluate(engine, node) -> np.ndarray:
    """AST → sorted int64 doc-id array, via the engine's set primitives.

    The engine handles tombstones/analysis; this layer only does set
    algebra, intersecting/unioning the primitive results."""
    if isinstance(node, Term):
        return engine.search_and([node.text])
    if isinstance(node, Phrase):
        return np.sort(np.asarray(engine.search_phrase(node.text), dtype=np.int64))
    if isinstance(node, Or):
        parts = [evaluate(engine, c) for c in node.children]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(parts))
    if isinstance(node, And):
        positives = [c for c in node.children if not isinstance(c, Not)]
        negatives = [c.child for c in node.children if isinstance(c, Not)]
        if not positives:
            raise ValueError("purely negative conjunction (complement of the corpus)")
        acc: np.ndarray | None = None
        for c in positives:
            ids = evaluate(engine, c)
            acc = ids if acc is None else acc[np.isin(acc, ids, assume_unique=True)]
            if len(acc) == 0:
                return acc
        for c in negatives:
            ids = evaluate(engine, c)
            if len(ids):
                acc = acc[~np.isin(acc, ids, assume_unique=True)]
            if len(acc) == 0:
                return acc
        return acc
    if isinstance(node, Not):
        raise ValueError("top-level NOT (complement of the corpus)")
    raise TypeError(f"unknown node {node!r}")


def search_boolean(engine, query: str) -> np.ndarray:
    """Parse + evaluate a boolean query string against the engine."""
    return evaluate(engine, parse_query(query))
