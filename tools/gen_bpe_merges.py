#!/usr/bin/env python3
"""Train the committed char-level BPE merges fixture and its goldens.

Driver-side tooling only (duckdb/pandas live outside the engine).

Training corpus: the `documents` table at the given SF dir. Words are
the engine's subword units — lowercase, split on `[^a-z0-9]+` — and
each word starts as a character sequence. Standard BPE training: count
adjacent-pair frequencies over the word-frequency dict, merge the most
frequent pair (ties broken lexicographically so training is
deterministic), repeat N times.

Outputs:
  src/main/resources/graft/bpe/merges.txt   rank-ordered `lhs<TAB>rhs`
  src/test/resources/bpe_goldens.tsv        `word<TAB>piece piece ...`

Usage: python3 tools/gen_bpe_merges.py [sfDir] [nMerges]
"""
import collections
import re
import sys
from pathlib import Path

import duckdb


def train(word_freq: dict, n_merges: int):
    """Standard BPE training over a {word: freq} dict."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for seq, f in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: max frequency, then lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def encode(word: str, ranks: dict):
    """Canonical BPE encode: repeatedly merge ALL occurrences of the
    min-rank adjacent pair (left-to-right, non-overlapping)."""
    seq = list(word)
    while len(seq) > 1:
        cand = [(ranks[(a, b)], i) for i, (a, b) in enumerate(zip(seq, seq[1:]))
                if (a, b) in ranks]
        if not cand:
            break
        rank = min(cand)[0]
        pair = None
        out, i = [], 0
        while i < len(seq):
            if (i + 1 < len(seq)
                    and ranks.get((seq[i], seq[i + 1])) == rank
                    and (pair is None or (seq[i], seq[i + 1]) == pair)):
                pair = (seq[i], seq[i + 1])
                out.append(seq[i] + seq[i + 1])
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def main(sf_dir="/root/testdata/sf0.01", n_merges="256"):
    n_merges = int(n_merges)
    con = duckdb.connect()
    rows = con.execute(f"""
      SELECT w AS word, count(*) AS f FROM (
        SELECT unnest(list_filter(
          regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
          x -> x <> '')) AS w
        FROM read_parquet('{sf_dir}/documents.parquet'))
      GROUP BY 1 ORDER BY 1""").fetchall()
    word_freq = dict(rows)
    print(f"{len(word_freq)} distinct words, "
          f"{sum(word_freq.values())} occurrences")
    merges = train(word_freq, n_merges)
    out = Path("src/main/resources/graft/bpe/merges.txt")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("".join(f"{a}\t{b}\n" for a, b in merges))
    print(f"wrote {len(merges)} merges to {out}")

    ranks = {p: i for i, p in enumerate(merges)}
    golden_words = sorted(word_freq, key=lambda w: -word_freq[w])[:60]
    golden_words += sorted(word_freq)[::max(1, len(word_freq) // 40)][:40]
    golden_words += ["a", "zzzz", "q0q0q0", "aaaa", "ababab"]
    seen, lines = set(), []
    for w in golden_words:
        if w in seen or not w:
            continue
        seen.add(w)
        lines.append(f"{w}\t{' '.join(encode(w, ranks))}\n")
    gp = Path("src/test/resources/bpe_goldens.tsv")
    gp.write_text("".join(lines))
    print(f"wrote {len(lines)} goldens to {gp}")


if __name__ == "__main__":
    main(*sys.argv[1:])
