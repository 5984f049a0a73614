"""String-similarity kernels for entity linking (SURVEY §2.6 L2).

Clean-room implementations of the 7-feature extractor of
`/root/reference/minmodkg/entity_linking.py:114-170` (the reference uses
the `strsim` Rust package; these are the standard published algorithms:
Levenshtein, Jaro-Winkler, Monge-Elkan with a Jaro-Winkler inner measure,
hybrid Jaccard with greedy max-weight matching, and the reference's
ordinal-digit feature).

Pure Python/numpy — invoked only inside Arrow batches from
operators/linking.py, never per-row over py4j.
"""

from __future__ import annotations

import re

import numpy as np


def levenshtein_similarity(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


def jaro_similarity(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(a: str, b: str, p: float = 0.1, max_l: int = 4) -> float:
    j = jaro_similarity(a, b)
    if j > 0.7:
        l = 0
        for x, y in zip(a[:max_l], b[:max_l]):
            if x != y:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


def monge_elkan_similarity(tokens_a: list[str], tokens_b: list[str]) -> float:
    """mean over a-tokens of the best Jaro-Winkler match in b."""
    if not tokens_a or not tokens_b:
        return 0.0
    total = 0.0
    for ta in tokens_a:
        total += max(jaro_winkler_similarity(ta, tb) for tb in tokens_b)
    return total / len(tokens_a)


def symmetric_monge_elkan_similarity(
    tokens_a: list[str], tokens_b: list[str]
) -> float:
    return (
        monge_elkan_similarity(tokens_a, tokens_b)
        + monge_elkan_similarity(tokens_b, tokens_a)
    ) / 2.0


def hybrid_jaccard_similarity(
    tokens_a: list[str], tokens_b: list[str], threshold: float = 0.5
) -> float:
    """Jaccard where 'equal' is soft: greedy max-weight 1:1 matching of
    token pairs with Jaro-Winkler ≥ threshold."""
    if not tokens_a or not tokens_b:
        return 0.0
    pairs = []
    for i, ta in enumerate(tokens_a):
        for j, tb in enumerate(tokens_b):
            s = jaro_winkler_similarity(ta, tb)
            if s >= threshold:
                pairs.append((s, i, j))
    pairs.sort(reverse=True)
    used_a: set[int] = set()
    used_b: set[int] = set()
    total = 0.0
    m = 0
    for s, i, j in pairs:
        if i in used_a or j in used_b:
            continue
        used_a.add(i)
        used_b.add(j)
        total += s
        m += 1
    return total / (len(tokens_a) + len(tokens_b) - m)


_DIGITS_RE = re.compile(r"\d+")


def does_ordinal_match(s1: str, s2: str, sim: float, threshold: float) -> float:
    """Ordinal-categorical guard (Su-30 vs Su-25) —
    ref entity_linking.py:151-170 verbatim semantics."""
    if sim < threshold:
        return 0.4
    d1 = _DIGITS_RE.findall(s1)
    d2 = _DIGITS_RE.findall(s2)
    if d1 == d2:
        return 1.0
    if len(d1) == 0 or len(d2) == 0:
        return 0.4
    return 0.0


_WS_RE = re.compile(r"\s+")


def _word_tokens(s: str) -> list[str]:
    return [t for t in _WS_RE.split(s.strip().lower()) if t]


def extract_pairwise_features(text: str, label: str) -> np.ndarray:
    """The 7-dim feature vector (ref entity_linking.py:125-148)."""
    t, l = text.lower(), label.lower()
    tw, lw = _word_tokens(text), _word_tokens(label)
    tu, lu = sorted(set(tw)), sorted(set(lw))
    sym_me = symmetric_monge_elkan_similarity(tw, lw)
    hyjac = hybrid_jaccard_similarity(tu, lu)
    return np.array(
        [
            levenshtein_similarity(t, l),
            jaro_winkler_similarity(t, l),
            monge_elkan_similarity(tw, lw),
            sym_me,
            hyjac,
            does_ordinal_match(text, label, sym_me, 0.7),
            does_ordinal_match(text, label, hyjac, 0.7),
        ],
        dtype=np.float64,
    )


def extract_features(text: str, labels: list[str]) -> np.ndarray:
    """Element-wise max over the entity's labels (ref :119-123)."""
    feat = np.zeros(7, dtype=np.float64)
    for label in labels:
        feat = np.maximum(feat, extract_pairwise_features(text, label))
    return feat


def score(text: str, labels: list[str]) -> float:
    return float(extract_features(text, labels).mean())
