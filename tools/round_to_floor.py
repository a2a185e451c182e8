#!/usr/bin/env python3
"""One-shot codemod: rewrite native round(EXPR, N) to the cross-engine-exact
floor form floor(EXPR * 10^N + 0.5) / 10^N (docs/SF1_GATE.md class-1 fix),
in both DuckDB oracle SQL strings and Spark Column code.

Native round() on doubles rounds the value's exact BigDecimal expansion in
Spark but in float math in DuckDB — on 10^-N-grid boundary values they
disagree (two real hits at sf1 in r14). floor/*/+ are IEEE-exact, so when
BOTH sides spell the same op sequence the results are bitwise identical.

Modes:
  sql   : round(E, N)  -> floor((E) * 10^N.0 + 0.5) / 10^N.0     (N > 0)
          round(E, 0)  -> floor((E) + 0.5)
  scala : round(E, N)  -> (floor((E) * lit(1eN) + lit(0.5)) / lit(1eN))
          round(E, 0)  -> floor((E) + lit(0.5))   [floor yields BIGINT]

Only integer-literal N converts; anything else is reported and left alone.
Occurrences of `bround` or word-prefixed round are skipped. Comment-line
hits (Scala `//` or ` * `) are skipped. Run once, review the git diff.
"""
import re
import sys


def find_matching(s, i):
    """i points at '('; return index of matching ')'. Tracks quotes."""
    depth = 0
    in_str = None
    j = i
    while j < len(s):
        c = s[j]
        if in_str:
            if c == in_str and s[j - 1] != '\\':
                in_str = None
        elif c in ('"', "'"):
            in_str = c
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError(f"unbalanced paren at {i}")


def split_last_arg(body):
    """Split 'EXPR, N' at the last depth-0 comma. Returns (expr, n) or None."""
    depth = 0
    in_str = None
    last = -1
    for j, c in enumerate(body):
        if in_str:
            if c == in_str and body[j - 1] != '\\':
                in_str = None
        elif c in ('"', "'"):
            in_str = c
        elif c == '(' or c == '[':
            depth += 1
        elif c == ')' or c == ']':
            depth -= 1
        elif c == ',' and depth == 0:
            last = j
    if last < 0:
        return body, None
    return body[:last], body[last + 1:].strip()


def is_comment_line(s, i):
    ls = s.rfind('\n', 0, i) + 1
    line = s[ls:i]
    stripped = line.lstrip()
    return stripped.startswith('//') or stripped.startswith('*')


def convert(text, mode):
    out = []
    pos = 0
    skipped = []
    n_conv = 0
    for m in re.finditer(r'(?<![A-Za-z0-9_.])round\(', text):
        i = m.start()
        if i < pos:
            continue
        op = m.end() - 1  # index of '('
        cl = find_matching(text, op)
        body = text[op + 1:cl]
        expr, n_raw = split_last_arg(body)
        if is_comment_line(text, i):
            skipped.append(('comment', text[i:cl + 1][:70]))
            continue
        if n_raw is None:
            n = 0
        else:
            if not re.fullmatch(r'-?\d+', n_raw):
                skipped.append(('non-literal N', text[i:cl + 1][:70]))
                continue
            n = int(n_raw)
        if n < 0:
            skipped.append(('negative N', text[i:cl + 1][:70]))
            continue
        expr = expr.strip()
        # already-parenthesized single exprs don't need another layer
        def wrap(e):
            if e.startswith('(') and find_matching(e, 0) == len(e) - 1:
                return e
            return f'({e})'
        if mode == 'sql':
            mult = f'{10**n}.0'
            if n == 0:
                repl = f'floor({wrap(expr)} + 0.5)'
            else:
                repl = f'floor({wrap(expr)} * {mult} + 0.5) / {mult}'
        else:
            mult = f'lit(1e{n})'
            if n == 0:
                repl = f'floor({wrap(expr)} + lit(0.5))'
            else:
                repl = f'(floor({wrap(expr)} * {mult} + lit(0.5)) / {mult})'
        out.append(text[pos:i])
        out.append(repl)
        pos = cl + 1
        n_conv += 1
    out.append(text[pos:])
    return ''.join(out), n_conv, skipped


def main():
    mode = sys.argv[1]
    assert mode in ('sql', 'scala')
    for path in sys.argv[2:]:
        with open(path) as f:
            text = f.read()
        new, n, skipped = convert(text, mode)
        with open(path, 'w') as f:
            f.write(new)
        print(f'{path}: {n} converted')
        for why, frag in skipped:
            print(f'  SKIP ({why}): {frag}')


if __name__ == '__main__':
    main()
