"""From-scratch byte-pair-encoding vocabulary training + tokenization
(Sennrich et al. 2016 — the public subword algorithm behind most LM
tokenizers; no external tokenizer library involved).

Scale shape (100 TB): BPE trains on the WORD-FREQUENCY dictionary, not
the raw corpus — the paper's own formulation — so the corpus-scale work
is ONE partial-aggregated ``groupBy(word)`` whose output is bounded by
distinct-word count (Heaps' law: ~10^6-10^7 at web scale), optionally
capped to the top-V words (a vocabulary-sized TakeOrderedAndProject,
never a corpus sort). The merge loop then runs DRIVER-side over that
compressed dict (the standard implementation everywhere), and the
learned merge table broadcasts back into ONE Arrow-batched pandas UDF
that tokenizes with a per-worker word→tokens memo, so each DISTINCT
word is segmented once per executor regardless of corpus size (the
reference's batch-predict lesson, func.py:34-60: apply the model per
batch with cached state, never per row from cold).

Correctness: no SQL engine can replay the merge loop, so this ships
pytest-only (the sanctioned coverage class of CLAUDE.md — like
``compression_ratio``): the paper's worked example pins the learned
merges, an independent naive re-implementation in the test mirrors
segmentation exactly, and a detokenization round-trip property holds
on the real testdata corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.textstats import words_of

# End-of-word marker symbol. The paper writes it as '</w>', but that
# LITERAL substring occurs in real web text (any page discussing markup)
# and would corrupt detokenization; we use a private-use codepoint and
# STRIP any occurrence of it from input words (documented normalization,
# like control-char stripping in real tokenizers), which makes
# detokenize() an exact inverse of the stripped text for ALL inputs.
END = ""


def word_frequencies(df: DataFrame, text_col: str,
                     top_v: int | None = None) -> DataFrame:
    """(word, cnt) over the corpus — the ONLY corpus-scale stage of BPE
    training. One narrow word explode + one partial-aggregated groupBy;
    ``top_v`` caps the training dict to the most frequent words
    (deterministic tie-break: count desc, word asc) via a
    vocabulary-sized top-k, never a corpus-grain sort."""
    from ocr_spark.operators.util import spread_small_scan

    freqs = (spread_small_scan(df.select(F.col(text_col)))
             .select(F.explode(words_of(F.col(text_col))).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if top_v is not None:
        freqs = freqs.orderBy(F.desc("cnt"), F.asc("word")).limit(top_v)
    return freqs


def bpe_train(word_freqs: list[tuple[str, int]],
              n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a (word, count) dict — the
    classic driver-side loop: count adjacent symbol pairs weighted by
    word frequency, merge the most frequent pair everywhere, repeat.
    Deterministic tie-break: highest count, then lexicographically
    SMALLEST pair (reproduces the paper's worked-example order); stops
    early when no pair occurs twice. Cost is O(n_merges * dict_size) —
    independent of corpus size by construction."""
    from collections import Counter

    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        w = w.replace(END, "")       # the marker-strip normalization
        if w:
            key = tuple(w) + (END,)
            vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        cnt = max(pairs.values())
        if cnt < 2:
            break
        best = min(p for p, c in pairs.items() if c == cnt)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
        merges.append(best)
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with trained merge ranks: repeatedly apply the
    LOWEST-rank (earliest-learned) applicable merge to all its
    occurrences, left to right — the standard apply order, which makes
    segmentation a pure function of the merge list. Occurrences of the
    END marker codepoint in the input are stripped first (see END); a
    word that was nothing but markers yields no tokens."""
    word = word.replace(END, "")
    if not word:
        return []
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (a, b)
        if best_rank is None:
            break
        out = []
        i = 0
        while i < len(sym):
            if (i + 1 < len(sym)
                    and sym[i] == best[0] and sym[i + 1] == best[1]):
                out.append(best[0] + best[1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


# Per-Python-worker segmentation memo keyed by the merge list itself
# (exact — a hash key could collide across models): {merges: (ranks,
# {word: tokens})}. The S8 per-executor-singleton pattern — each distinct
# word is segmented once per worker process, across batches AND jobs.
# Small LRU (ADVICE r3): two tokenize jobs with different merge tables
# interleaved on one executor must not thrash each other's word memos
# every batch; bounded at _MEMO_MAX models so a sweep over retrained
# tables still cannot ratchet up a Heaps-law dict per historical model.
from collections import OrderedDict

_MEMO: "OrderedDict[tuple, tuple[dict, dict]]" = OrderedDict()
_MEMO_MAX = 4


def _memo_entry(mkey: tuple, mlist: list) -> tuple[dict, dict]:
    """(ranks, word-memo) for a merge table, LRU-cached per worker."""
    entry = _MEMO.get(mkey)
    if entry is None:
        while len(_MEMO) >= _MEMO_MAX:
            _MEMO.popitem(last=False)  # evict least-recently-used
        entry = ({p: i for i, p in enumerate(mlist)}, {})
        _MEMO[mkey] = entry
    else:
        _MEMO.move_to_end(mkey)
    return entry


def bpe_tokenize(df: DataFrame, id_col: str, text_col: str,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize the corpus under trained merges: one Arrow-batched
    pandas UDF over the text column (narrow — text never shuffles),
    the merge table shipped once in the UDF closure (vocabulary-sized,
    the broadcast-table discipline) and expanded into a per-worker
    rank dict + word memo on first use. Returns
    (id, tokens ARRAY<STRING>, n_bpe_tokens INT)."""
    mkey = tuple(merges)
    mlist = list(merges)

    @F.pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        ranks, memo = _memo_entry(mkey, mlist)
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in t.split(" "):
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = bpe_segment(w, ranks)
                    memo[w] = seg
                toks.extend(seg)
            out.append(toks)
        return pd.Series(out)

    toks = _tok(F.col(text_col))
    return df.select(F.col(id_col), toks.alias("tokens")) \
             .withColumn("n_bpe_tokens", F.size("tokens").cast("int"))


def detokenize(tokens: list[str]) -> str:
    """Exact inverse of tokenization over marker-stripped text:
    concatenate and turn each end-of-word marker back into a single
    space. Exactness holds for ALL inputs because the marker codepoint
    is stripped from words before segmentation, so it can only ever
    appear as the word terminator."""
    return "".join(tokens).replace(END, " ").rstrip(" ")
