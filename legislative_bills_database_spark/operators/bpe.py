"""Byte-pair-encoding tokenizer training and encoding.

The north-star token-counting surface (functions/text.py) counts
whitespace/regex tokens; real training pipelines tokenize with a LEARNED
subword vocabulary. BPE training is an inherently sequential greedy loop
(each merge depends on the last), but its input is NOT the corpus — it is
the word-frequency table, which is vocabulary-bounded (Heaps' law: ~1e5-
1e6 distinct words at any corpus size, vs 1e12 tokens).

Scale posture:

- ONE corpus-scale pass: explode → groupBy(word) → count (map-side
  partial agg). Everything after runs on the bounded word table.
- the greedy merge loop runs driver-side on the top-``max_words`` rows —
  the same bounded-driver-fit precedent as IVF's k-means (operators/
  ivf.py): fit input is O(vocab), independent of corpus size, with a
  deterministic (count DESC, word) tie-break so training is reproducible.
- encoding broadcasts the learned merge ranks and applies them in an
  Arrow-batched pandas UDF — per-word greedy merging is genuinely
  sequential per datum (no relational form), which is the documented
  justification for leaving whole-stage codegen; the UDF is 1-in-1-out
  over batches, zero shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """The bounded (word, count) fit table: top ``max_words`` by
    (count DESC, word ASC) — deterministic under ties."""
    wf = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_words)
    )
    return [(r.w, r.n) for r in wf.collect()]


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train_merges(
    word_freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Classic BPE greedy loop over the bounded word table: repeatedly
    merge the most frequent adjacent symbol pair ((count, pair)-max, so
    ties resolve deterministically). Returns (rank, left, right,
    pair_count); stops early when no pair repeats."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in word_freq:
        words[tuple(w)] = words.get(tuple(w), 0) + n
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append((rank, best[0], best[1], pairs[best]))
        words = {
            _merge_word(sym, best): n for sym, n in words.items()
        }  # dict re-key merges identical post-merge words
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Train BPE on a corpus; returns the merge table as a DataFrame
    (rank, left, right, merged, pair_count)."""
    merges = bpe_train_merges(word_frequencies(docs, text_col, max_words), n_merges)
    return docs.sparkSession.createDataFrame(
        [(r, a, b, a + b, n) for r, a, b, n in merges],
        "rank int, left string, right string, merged string, pair_count long",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = tuple(word)
    while len(sym) > 1:
        ranked = [
            (ranks[p], i)
            for i, p in enumerate(zip(sym, sym[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        # merge ALL occurrences of the best-ranked pair (standard BPE)
        sym = _merge_word(sym, (sym[i], sym[i + 1]))
    return list(sym)


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with the learned merges: (id, n_words, n_tokens,
    n_unk_chars). Merge ranks are collected once (bounded: n_merges
    rows) and closed over into an Arrow-batched mapInPandas — greedy
    per-word merging has no relational form; this is the slow-path
    justification, and the UDF is scan-shaped (no shuffle)."""
    # collect ONCE: merges may carry a full bpe_train lineage, so a second
    # collect would re-run the whole corpus word-count pass
    merge_rows = merges.collect()
    rank_map = {(r.left, r.right): r.rank for r in merge_rows}
    vocab = {r.merged for r in merge_rows} | {
        c for (a, b) in rank_map for c in (a, b)
    }

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).lower().split() if w]
                toks: list[str] = []
                for w in words:
                    toks.extend(_encode_word(w, rank_map))
                unk = sum(1 for t in toks if t not in vocab and len(t) == 1)
                rows.append((did, len(words), len(toks), unk))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_tokens", "n_unk_chars"]
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode,
        schema=f"{id_col} long, n_words long, n_tokens long, n_unk_chars long",
    )
