"""Word Error Rate — jiwer-equivalent (nraw_vs_wer.py:6, :82).

jiwer.wer(ref, hyp) with default transforms: strip, collapse repeated
whitespace, split on spaces, then Levenshtein distance over word sequences
divided by the number of reference words. Implemented natively (jiwer is a
dependency of the reference, not of this framework).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _words(s: str) -> List[str]:
    return s.strip().split()


def word_edit_counts(
    reference: Sequence[str], hypothesis: Sequence[str]
) -> Tuple[int, int, int, int]:
    """(substitutions, deletions, insertions, hits) via Wagner-Fischer DP."""
    n, m = len(reference), len(hypothesis)
    # dp[i][j] = (cost, subs, dels, ins, hits) for ref[:i] vs hyp[:j]
    prev = [(j, 0, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, i, 0, 0)] + [None] * m
        ri = reference[i - 1]
        for j in range(1, m + 1):
            if ri == hypothesis[j - 1]:
                c, s, d, a, h = prev[j - 1]
                cur[j] = (c, s, d, a, h + 1)
            else:
                sub = prev[j - 1]
                dele = prev[j]
                ins = cur[j - 1]
                best = min(sub[0], dele[0], ins[0])
                if sub[0] == best:
                    cur[j] = (sub[0] + 1, sub[1] + 1, sub[2], sub[3], sub[4])
                elif dele[0] == best:
                    cur[j] = (dele[0] + 1, dele[1], dele[2] + 1, dele[3], dele[4])
                else:
                    cur[j] = (ins[0] + 1, ins[1], ins[2], ins[3] + 1, ins[4])
        prev = cur
    _, s, d, a, h = prev[m]
    return s, d, a, h


def _tokenize_pair(ref_w: Sequence[str], hyp_w: Sequence[str]):
    ids: dict = {}
    def enc(ws):
        return [ids.setdefault(w, len(ids)) for w in ws]
    return enc(ref_w), enc(hyp_w)


def wer(reference: str, hypothesis: str) -> float:
    """WER = (S + D + I) / len(reference words), jiwer semantics.

    Uses the native C++ scorer (asr_shap.native) when built; pure-Python
    Wagner-Fischer otherwise — both produce identical counts (tested)."""
    ref_w = _words(reference)
    hyp_w = _words(hypothesis)
    if not ref_w:
        raise ValueError("reference must contain at least one word")
    try:
        from asr_shap.native import wer_counts_native

        counts = wer_counts_native(*_tokenize_pair(ref_w, hyp_w))
    except Exception:
        counts = None
    if counts is None:
        counts = word_edit_counts(ref_w, hyp_w)
    s, d, i, _ = counts
    return (s + d + i) / len(ref_w)


def batch_wer(references: Sequence[str], hypotheses: Sequence[str]) -> List[float]:
    """Per-pair WER for a batch of transcript pairs in ONE native call
    (asr_shap.native.batch_wer_native runs the Levenshtein DPs GIL-free in
    C++); falls back to the per-pair Python scorer. Pairs whose reference is
    empty yield nan (the sweep's convention for unscoreable rows)."""
    if len(references) != len(hypotheses):
        raise ValueError("references and hypotheses must have equal length")
    pairs = [(_words(r), _words(h)) for r, h in zip(references, hypotheses)]
    scoreable = [i for i, (rw, _) in enumerate(pairs) if rw]
    out = [float("nan")] * len(pairs)
    if not scoreable:
        return out
    counts = None
    try:
        from asr_shap.native import batch_wer_native

        toks = [_tokenize_pair(*pairs[i]) for i in scoreable]
        counts = batch_wer_native([t[0] for t in toks], [t[1] for t in toks])
    except Exception:
        counts = None
    if counts is None:
        counts = [word_edit_counts(*pairs[i]) for i in scoreable]
    for row, i in enumerate(scoreable):
        s, d, ins, _ = (int(v) for v in counts[row])
        out[i] = (s + d + ins) / len(pairs[i][0])
    return out
