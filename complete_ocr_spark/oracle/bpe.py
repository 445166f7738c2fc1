"""Independent pure-Python BPE reference (Counter/dict based, no Spark,
no shared code with functions/bpe.py beyond the published algorithm).

Implements subword-nmt-style merge learning: count adjacent symbol pairs
over the word-frequency table, repeatedly take the most frequent pair
(ties broken lexicographically on (lhs, rhs)), rewrite every word with one
leftmost-first greedy pass. Used by scripts/gen_goldens.py to mint the
committed golden the Spark implementation is hash-gated against, and by
tests/test_bpe.py for randomized cross-implementation parity.
"""

from __future__ import annotations

from collections import Counter

END = "</w>"
_WS = " \t\n\x0b\f\r"  # Java \s — matches the engine's normalized()


def norm_words(text: str) -> list[str]:
    return [w for w in text.strip(_WS).lower().translate(
        str.maketrans(_WS, " " * len(_WS))).split(" ") if w]


def _merge_word(syms: tuple[str, ...], lhs: str, rhs: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train(texts, n_merges: int, min_pair_count: int = 2):
    """-> (merges, vocab): merges = [(rank, lhs, rhs, pair_count)], vocab =
    {word: final symbol tuple}."""
    freq: Counter = Counter()
    for t in texts:
        if t is not None:
            freq.update(norm_words(t))
    vocab = {w: tuple(w) + (END,) for w in freq}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        pairs: Counter = Counter()
        for w, c in freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # max count, then lexicographically smallest (lhs, rhs)
        cnt, (lhs, rhs) = min(
            ((-c, p) for p, c in pairs.items()), key=lambda x: x
        )
        cnt = -cnt
        if cnt < min_pair_count:
            break
        merges.append((rank, lhs, rhs, cnt))
        vocab = {w: _merge_word(s, lhs, rhs) for w, s in vocab.items()}
    return merges, vocab


def encode(text: str, merges) -> list[str]:
    """Rank-order application of learned merges (one pass each) to every
    word of the normalized text; returns the full token stream."""
    ops = [(m[1], m[2]) if len(m) >= 3 else m for m in merges]
    out: list[str] = []
    for w in norm_words(text):
        syms = tuple(w) + (END,)
        for lhs, rhs in ops:
            if len(syms) == 1:
                break
            syms = _merge_word(syms, lhs, rhs)
        out.extend(syms)
    return out
