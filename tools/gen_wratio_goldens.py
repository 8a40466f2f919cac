#!/usr/bin/env python3
"""Generate the committed WRatio golden vectors from the independent
Python reference (tools/wratio_ref.py).

Usage: python3 tools/gen_wratio_goldens.py > src/test/resources/wratio_golden.tsv

The case list is deterministic (fixed seed) and spans the branch
structure: length-ratio boundaries (1.5 / 8.0), clipped partial windows,
duplicate tokens (token_sort vs token_set divergence), shared-token
short-circuit, empty/degenerate inputs, non-ASCII BMP text, and strings
past the 64-char bit-parallel limit of the Scala implementation.
Floats are printed with repr() — round-trip exact.
"""
import random
import sys

import wratio_ref as W

HAND = [
    ("", ""), ("", "x"), ("a", ""), ("a", "a"), ("a", "b"),
    ("small ring", "small anzac ring"),
    ("small ring", "ring small"),
    ("new york", "york new city"),
    ("the grand hotel", "grand hotel"),
    ("grand hotel", "the grand hotel spa and resort downtown"),
    ("cafe", "the cafe at the end of a very long street name indeed"),
    ("a", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    ("ab", "ababababababababab"),
    ("kuala lumpur", "kualalumpur"),
    ("sentral kl", "kl sentral station"),
    ("st mary s church", "church of st mary"),
    ("x y z", "z y x"),
    ("aa bb cc", "cc bb aa dd"),
    ("tok tok tok", "tok"),
    ("one two two three", "two three four"),
    ("muenchen hbf", "münchen hauptbahnhof"),
    ("tōkyō eki", "tokyo station"),
    ("abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz0123456789",
     "abcdefghijklmnopqrstuvwxyz0123456789"),
    ("pqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdef",
     "qrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefg"),
    ("abc", "abcd"),      # len_ratio = 1.333 < 1.5
    ("abc", "abcde"),     # len_ratio = 1.667 -> partial branch
    ("ab", "abcdefghijklmnop"),  # len_ratio = 8.0 -> 0.6 scale
    ("ab", "abcdefghijklmno"),   # len_ratio = 7.5 -> 0.9 scale
]


def rand_cases(rng, n):
    toks = ["small", "ring", "grand", "hotel", "st", "mary", "kl", "a",
            "anzac", "plaza", "café", "1", "22", "north", "x"]
    out = []
    for _ in range(n):
        la = rng.randint(1, 6)
        lb = rng.randint(1, 6)
        a = " ".join(rng.choice(toks) for _ in range(la))
        b = " ".join(rng.choice(toks) for _ in range(lb))
        out.append((a, b))
        # also a char-soup pair over a tiny alphabet (dense LCS structure)
        ca = "".join(rng.choice("ab c") for _ in range(rng.randint(1, 30))).strip()
        cb = "".join(rng.choice("ab c") for _ in range(rng.randint(1, 30))).strip()
        if ca and cb:
            out.append((" ".join(ca.split()), " ".join(cb.split())))
    return out


def main():
    rng = random.Random(20260812)
    cases = HAND + rand_cases(rng, 40)
    w = sys.stdout
    w.write("a\tb\tratio\tpartial\ttoken_sort\ttoken_set\tpartial_token_sort\tpartial_token_set\twratio\n")
    seen = set()
    for a, b in cases:
        if (a, b) in seen:
            continue
        seen.add((a, b))
        vals = [W.ratio(a, b), W.partial_ratio(a, b),
                W.token_sort_ratio(a, b), W.token_set_ratio(a, b),
                W.partial_token_sort_ratio(a, b), W.partial_token_set_ratio(a, b),
                W.wratio(a, b)]
        w.write(a + "\t" + b + "\t" + "\t".join(repr(v) for v in vals) + "\n")


if __name__ == "__main__":
    main()
