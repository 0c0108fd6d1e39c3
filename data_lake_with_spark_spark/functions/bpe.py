"""Minimal pure-Python byte-pair encoding (BPE) — the vendored-model
backend for the tokenizer seam (functions/tokenizers.py).

The seam's model-backed backends (tiktoken, fastText) are import-gated
and unexercisable in an offline environment, which left the seam's
CONTRACT (same output schema, swap-in by name, one model load per
worker, Arrow batching) trusted rather than tested. This module makes
it testable with zero dependencies: the classic BPE algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the same merge-ranks scheme GPT-2's tokenizer uses)
over a GPT-2-style pre-tokenization, with a small merges table trained
deterministically on the repo's documents fixture and checked in as
``resources/bpe_merges_mini.jsonl`` (regenerate with
``tools/train_bpe.py``).

Properties the tests pin:
- lossless: ``"".join(encode(text)) == text`` for any input (BPE only
  ever concatenates adjacent symbols of the pre-token stream);
- deterministic: merges apply by rank (lowest first), ties in training
  break by count then lexicographic pair;
- real compression: trained merges produce fewer tokens than
  characters on fixture-like text.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from collections.abc import Iterable

#: GPT-2-style pre-tokenizer in Python-`re` syntax (`re` lacks \\p{L};
#: [^\\W\\d_] is the unicode-aware letter class). Contractions, then
#: optionally-space-prefixed letter/digit/punct runs, then whitespace.
#: The punct run must include '_' explicitly: underscore is neither a
#: "letter" ([^\\W\\d_] excludes it) nor "[^\\s\\w]" (it IS \\w), so
#: without the alternation a bare '_' silently VANISHED and broke the
#: lossless-concatenation contract (found by the hypothesis fuzzer;
#: GPT-2's real \\p{L}/\\p{N} classes treat _ as punctuation).
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def pretokenize(text: str) -> list[str]:
    """Split text into GPT-2-style pre-tokens (lossless: concatenation
    reproduces the input)."""
    return _PRETOKEN_RE.findall(text or "")


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(texts: Iterable[str], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a corpus: repeatedly merge
    the most frequent adjacent symbol pair across the pre-token
    vocabulary (counts weighted by word frequency). Ties break by
    lexicographic pair so training is deterministic for a fixed corpus
    regardless of dict/hash order."""
    word_counts: Counter[str] = Counter()
    for t in texts:
        word_counts.update(pretokenize(t))
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if len(w) > 1:
            words[tuple(w)] = words.get(tuple(w), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        rebuilt: dict[tuple[str, ...], int] = {}
        for w, c in words.items():
            m = _merge_word(w, best)
            rebuilt[m] = rebuilt.get(m, 0) + c
        words = rebuilt
    return merges


class BPETokenizer:
    """Greedy rank-ordered BPE encoder (GPT-2's ``bpe()`` shape): per
    pre-token, repeatedly merge the adjacent pair with the LOWEST
    training rank until no ranked pair remains."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(p): i for i, p in enumerate(merges)
        }
        self._cache: dict[str, tuple[str, ...]] = {}

    def _encode_word(self, word: str) -> tuple[str, ...]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        symbols = tuple(word)
        while len(symbols) > 1:
            ranked = [
                (self.ranks[p], i)
                for i, p in enumerate(zip(symbols, symbols[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            _best_rank, i = min(ranked)
            symbols = (
                symbols[:i]
                + (symbols[i] + symbols[i + 1],)
                + symbols[i + 2 :]
            )
        if len(self._cache) < 100_000:  # bound worker-process memory
            self._cache[word] = symbols
        return symbols

    def encode(self, text: str) -> list[str]:
        return [
            tok for w in pretokenize(text) for tok in self._encode_word(w)
        ]


def dump_merges(merges: list[tuple[str, str]]) -> str:
    """One JSON ``[left, right]`` array per line — robust to tokens
    containing spaces/tabs/newlines (leading-space word pieces and
    whitespace-run tokens are normal in GPT-2-style BPE)."""
    return "\n".join(json.dumps(list(p), ensure_ascii=False) for p in merges)


def load_merges(payload: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for line in payload.splitlines():
        if line.strip():
            a, b = json.loads(line)
            out.append((a, b))
    return out


def load_vendored() -> BPETokenizer:
    """The checked-in mini model (``resources/bpe_merges_mini.jsonl``),
    loaded through importlib.resources so it works both from the repo
    checkout and from the addPyFile package zip on executors."""
    from importlib.resources import files

    payload = (
        files("data_lake_with_spark_spark.resources")
        .joinpath("bpe_merges_mini.jsonl")
        .read_text(encoding="utf-8")
    )
    return BPETokenizer(load_merges(payload))
