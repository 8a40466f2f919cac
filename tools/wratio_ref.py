#!/usr/bin/env python3
"""Independent reference implementation of the WRatio fuzzy-similarity
family, written directly from the published algorithm description
(rapidfuzz/fuzzywuzzy semantics as pinned in SURVEY.md F14):

  ratio(a, b)        = 100 * 2*LCS(a,b) / (|a|+|b|)   (Indel similarity)
  partial_ratio      = best ratio of the shorter string against every
                       window (including edge-clipped windows) of the longer
  token_sort_ratio   = ratio over space-sorted token joins
  token_set_ratio    = max of ratios over intersection/difference joins
  partial_token_*    = partial_ratio over the token-transformed strings
  wratio             = length-ratio-weighted max of the above

This file deliberately shares NO code with the Scala engine (classic
quadratic DP here vs bit-parallel there) so the committed golden vectors
in src/test/resources/wratio_golden.tsv are a genuine second opinion.
Used by tools/gen_wratio_goldens.py and the oracle-SQL parity test.
"""


def lcs(a: str, b: str) -> int:
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ca = a[i - 1]
        for j in range(1, m + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return prev[m]


def ratio(a: str, b: str) -> float:
    n = len(a) + len(b)
    if n == 0:
        return 100.0
    return 200.0 * lcs(a, b) / n


def partial_ratio(a: str, b: str) -> float:
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    if not s:
        return 100.0 if not l else 0.0
    m = len(s)
    best = 0.0
    for i in range(-(m - 1), len(l)):
        lo = max(0, i)
        hi = min(len(l), i + m)
        r = ratio(s, l[lo:hi])
        if r > best:
            best = r
    return best


def _words(s: str):
    return [w for w in s.split(" ") if w]


def _sort_join(s: str) -> str:
    return " ".join(sorted(_words(s)))


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(_sort_join(a), _sort_join(b))


def _set_parts(a: str, b: str):
    sa, sb = set(_words(a)), set(_words(b))
    sect = " ".join(sorted(sa & sb))
    da = " ".join(sorted(sa - sb))
    db = " ".join(sorted(sb - sa))
    ab = " ".join(x for x in (sect, da) if x)
    ba = " ".join(x for x in (sect, db) if x)
    return sect, ab, ba, bool(sa & sb)


def token_set_ratio(a: str, b: str) -> float:
    sect, ab, ba, _ = _set_parts(a, b)
    return max(ratio(ab, ba), ratio(sect, ab), ratio(sect, ba))


def partial_token_sort_ratio(a: str, b: str) -> float:
    return partial_ratio(_sort_join(a), _sort_join(b))


def partial_token_set_ratio(a: str, b: str) -> float:
    sa, sb = set(_words(a)), set(_words(b))
    if sa & sb:
        return 100.0
    return partial_ratio(" ".join(sorted(sa)), " ".join(sorted(sb)))


MAX_LEN = 512  # per-side input cap, mirrors graft.core.Fuzz.MaxLen


def wratio(a: str, b: str) -> float:
    if not a or not b:
        return 0.0
    a, b = a[:MAX_LEN], b[:MAX_LEN]
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    base = ratio(a, b)
    if len_ratio < 1.5:
        token = max(token_sort_ratio(a, b), token_set_ratio(a, b))
        return max(base, 0.95 * token)
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    with_partial = max(base, partial_scale * partial_ratio(a, b))
    ptoken = max(partial_token_sort_ratio(a, b), partial_token_set_ratio(a, b))
    return max(with_partial, 0.95 * partial_scale * ptoken)
