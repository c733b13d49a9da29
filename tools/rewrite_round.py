#!/usr/bin/env python3
"""One-shot codemod: replace round(expr, n) with the canonical floor-based
rounding, in Scala code (-> graft.functions.Metrics.canonRound) and in the
embedded DuckDB oracle SQL strings (-> floor((expr) * 1eN + 0.5)/1eN)."""
import re
import sys


def find_string_spans(src: str):
    """Spans of triple-quoted strings."""
    spans = []
    i = 0
    while True:
        a = src.find('"""', i)
        if a < 0:
            break
        b = src.find('"""', a + 3)
        if b < 0:
            break
        spans.append((a, b + 3))
        i = b + 3
    return spans


def in_spans(pos, spans):
    return any(a <= pos < b for a, b in spans)


def parse_call(src, start):
    """src[start:] begins at the '(' of round(. Return (args_str, end_index_after_close)."""
    depth = 0
    i = start
    while i < len(src):
        c = src[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return src[start + 1:i], i + 1
        i += 1
    raise ValueError("unbalanced")


def split_last_comma(args):
    depth = 0
    for i in range(len(args) - 1, -1, -1):
        c = args[i]
        if c in ')]}':
            depth += 1
        elif c in '([{':
            depth -= 1
        elif c == ',' and depth == 0:
            return args[:i], args[i + 1:]
    raise ValueError("no top-level comma: " + args)


def rewrite(path):
    src = open(path).read()
    out = []
    pos = 0
    pat = re.compile(r'(?<![A-Za-z0-9_.])round\(')
    while True:
        spans = find_string_spans(src)
        m = pat.search(src, pos)
        if not m:
            break
        args, end = parse_call(src, m.end() - 1)
        expr, scale = split_last_comma(args)
        expr, scale = expr.strip(), scale.strip()
        if not scale.isdigit():
            pos = m.end()
            continue
        if in_spans(m.start(), spans):
            rep = f"floor(({expr}) * 1e{scale} + 0.5)/1e{scale}"
        else:
            rep = f"graft.functions.Metrics.canonRound({expr}, {scale})"
        src = src[:m.start()] + rep + src[end:]
        pos = m.start() + len(rep)
    open(path, 'w').write(src)
    print(f"rewrote {path}")


for p in sys.argv[1:]:
    rewrite(p)
