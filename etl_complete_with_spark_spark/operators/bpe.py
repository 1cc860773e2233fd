"""BPE tokenizer-training support: distributed pair counting + merges.

The corpus-scale part of byte-pair-encoding training is exactly ONE
distributed pass: the word-frequency table. Everything after — counting
adjacent symbol pairs, picking the best merge, re-segmenting — operates
on the DISTINCT-WORD table (vocab-sized: ~10^5-10^6 rows no matter how
many TB of text), which is how production tokenizer trainers are built.
Getting this split right is the difference between "BPE over 100 TB" and
"BPE over 200k rows".

- :func:`word_freqs` — the one corpus-scale aggregation (map-side
  combined groupBy).
- :func:`pair_counts` — adjacent char-pair counts weighted by word
  frequency, fully distributed and codegen'd (split/slide/explode);
  exact-oracle-able (catalog query ``bpe_top_pairs``).
- :func:`bpe_train` — the merge loop over the collected word-frequency
  table (vocab-sized by construction; driver-local like every real
  tokenizer trainer). Deterministic: ties on pair frequency break
  lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalized_text, tokens

END = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the only corpus-scale stage."""
    return (
        df.select(F.explode(tokens(normalized_text(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent character-pair counts weighted by word frequency.

    The round-0 BPE statistic (symbols = single characters; the
    end-of-word marker is a training-loop concern, not a counting one).
    Pure codegen: split to chars, slide a 2-window via
    transform(sequence), explode, sum freq — the explode is over the
    distinct-word table, so its cost is vocab x word-length, independent
    of corpus row count.
    """
    wf = word_freqs(df, text_col)
    pairs = F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
    return (
        wf.filter(F.length("word") >= 2)
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def bpe_train(word_freq_rows: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (word, freq) table.

    Input is the COLLECTED word-frequency table (vocab-sized — collect it
    from :func:`word_freqs`; that is not a scale compromise but the
    standard architecture). Words are segmented into single characters
    plus a terminal ``</w>`` marker; each round merges the most frequent
    adjacent symbol pair (ties: lexicographically smallest pair) until
    ``n_merges`` merges are done or no pair repeats. Returns the ordered
    merge list — with the deterministic tie-break, a reproducible
    tokenizer artifact.
    """
    segs: dict[tuple[str, ...], int] = {}
    for word, freq in word_freq_rows:
        sym = tuple(list(word) + [END])
        segs[sym] = segs.get(sym, 0) + int(freq)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in segs.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merged = best[0] + best[1]
        new_segs: dict[tuple[str, ...], int] = {}
        for sym, freq in segs.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_segs[t] = new_segs.get(t, 0) + freq
        segs = new_segs
        merges.append(best)
    return merges


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply an ordered merge list to one word (the tokenizer's encode
    path, merge-rank greedy like the original BPE paper)."""
    sym: list[str] = list(word) + [END]
    rank = {m: i for i, m in enumerate(merges)}
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = rank.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym
