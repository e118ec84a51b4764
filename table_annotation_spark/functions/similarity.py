"""Fuzzy string similarity — deterministic reimplementation of the rapidfuzz
ratios the reference relies on.

Reference semantics (cited for parity; no code is copied):
- ``fuzz.ratio``            → indel-normalized similarity
  (/root/reference/lookup/es_lookup.py:129-137).
- ``fuzz.token_sort_ratio`` → ratio over whitespace-sorted tokens.
- ``fuzz.token_set_ratio``  → fuzzywuzzy set algebra on token sets.
- ``fuzz.partial_ratio``    → best-window ratio of shorter vs longer.
- ``textual_similarity``    → mean of top-2 of {ratio, token_sort, token_set}
  on lowercased inputs (/root/reference/annotation/annot_scripts/utils.py:65-76).

All ratios returned in [0, 1] (the reference divides rapidfuzz's 0-100 by
100 at use sites).
"""

from __future__ import annotations

from functools import lru_cache


def _indel_distance(a: str, b: str) -> int:
    """Indel (insert/delete only) edit distance == len(a)+len(b)-2*LCS."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # classic LCS DP, one row at a time
    prev = [0] * (la + 1)
    for ch_b in b:
        cur = [0] * (la + 1)
        for i, ch_a in enumerate(a):
            if ch_a == ch_b:
                cur[i + 1] = prev[i] + 1
            else:
                cur[i + 1] = cur[i] if cur[i] >= prev[i + 1] else prev[i + 1]
        prev = cur
    lcs = prev[la]
    return la + lb - 2 * lcs


def ratio(a: str, b: str) -> float:
    """Normalized indel similarity in [0,1] (rapidfuzz.fuzz.ratio/100)."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return (total - _indel_distance(a, b)) / total


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(_sorted_tokens(a), _sorted_tokens(b))


def token_set_ratio(a: str, b: str) -> float:
    """fuzzywuzzy token_set algebra: compare sorted-intersection against each
    full sorted-union side, take the max."""
    ta, tb = set(a.split()), set(b.split())
    if not ta and not tb:
        return 1.0
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def partial_ratio(a: str, b: str) -> float:
    """Best ratio of the shorter string against any equal-length window of
    the longer one (sliding alignment, step 1)."""
    if len(a) > len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if la == 0:
        return 1.0 if lb == 0 else 0.0
    if la == lb:
        return ratio(a, b)
    best = 0.0
    for start in range(lb - la + 1):
        r = ratio(a, b[start : start + la])
        if r > best:
            best = r
            if best >= 1.0:
                break
    return best


@lru_cache(maxsize=262144)
def textual_similarity(s1: str, s2: str) -> float:
    """Mean of the top-2 of {ratio, token_sort_ratio, token_set_ratio} on
    lowercased inputs — reference annotation/annot_scripts/utils.py:65-76."""
    a, b = s1.lower(), s2.lower()
    scores = sorted(
        (ratio(a, b), token_sort_ratio(a, b), token_set_ratio(a, b)),
        reverse=True,
    )
    return (scores[0] + scores[1]) / 2.0


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein (sub cost 1) — used for blocking-recall checks."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j, ch_b in enumerate(b, 1):
        cur = [j] + [0] * la
        for i, ch_a in enumerate(a, 1):
            cur[i] = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (ch_a != ch_b),
            )
        prev = cur
    return prev[la]


def mixed_fuzzy_score(mention: str, label: str) -> float:
    """The reference's per-hit fuzzy score (lookup/es_lookup.py:123-174):

    For each of {ratio, token_sort_ratio, token_set_ratio}:
        0.9 * f(lower(mention), lower(label)) + 0.1 * f(mention, label)
    token_set only participates when 0.5 < len(mention)/len(label) < 2.
    Final fuzzy = mean of the top-2 participating scores.
    """
    ml, ll = mention.lower(), label.lower()
    scores = [
        0.9 * ratio(ml, ll) + 0.1 * ratio(mention, label),
        0.9 * token_sort_ratio(ml, ll) + 0.1 * token_sort_ratio(mention, label),
    ]
    if label and 0.5 < (len(mention) / max(len(label), 1)) < 2:
        scores.append(
            0.9 * token_set_ratio(ml, ll) + 0.1 * token_set_ratio(mention, label)
        )
    scores.sort(reverse=True)
    top2 = scores[:2]
    return sum(top2) / len(top2)


def is_partial_exact(mention: str, label: str) -> bool:
    """Reference partial-exact bypass (es_lookup.py:140-148): mixed
    0.9·lower + 0.1·raw partial ratio with small token-count difference, or
    mixed token_set ratio — the latter only when the two labels have similar
    lengths (0.5 < len(mention)/len(label) < 2.0), since token_set is noisy
    on dissimilar lengths."""
    ml, ll = mention.lower(), label.lower()
    token_diff = abs(len(ml.split()) - len(ll.split()))
    partial_mixed = 0.9 * partial_ratio(ml, ll) + 0.1 * partial_ratio(mention, label)
    if partial_mixed > 0.9 and token_diff <= 2:
        return True
    if ll and 0.5 < len(ml) / len(ll) < 2.0:
        ts_mixed = (
            0.9 * token_set_ratio(ml, ll) + 0.1 * token_set_ratio(mention, label)
        )
        return ts_mixed > 0.9
    return False
