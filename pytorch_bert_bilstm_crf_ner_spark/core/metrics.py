"""Span-exact evaluation math (`utils/metricsUtils.py:11-72`).

A predicted span is a true positive iff some golden span has the same
mention text AND the same start offset (`metricsUtils.py:19`); each golden
span can absorb at most... note: the reference breaks on the FIRST matching
golden span but never removes it, so duplicate predictions of the same
(mention, start) each count as tp.  We reproduce that faithfully here for
the single-process oracle; the DataFrame-side eval join uses the same
(mention, start[, type]) equi-join semantics.
"""

from __future__ import annotations


def calculate_metric(gt: list, predict: list) -> tuple[int, int, int]:
    """(tp, fp, fn); spans compared on (mention, start) only, like
    `metricsUtils.py:11-28` (type is handled by calling per type)."""
    tp = 0
    for p in predict:
        if any(p[0] == g[0] and p[1] == g[1] for g in gt):
            tp += 1
    fp = len(predict) - tp
    fn = len(gt) - tp
    return tp, fp, fn


def get_p_r_f(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """`metricsUtils.py:31-35`."""
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def micro_prf(per_type: dict[str, tuple[int, int, int]]) -> tuple[float, float, float]:
    """Micro P/R/F1 over a per-type (tp, fp, fn) dict (`main.py:113-114`)."""
    tp = sum(v[0] for v in per_type.values())
    fp = sum(v[1] for v in per_type.values())
    fn = sum(v[2] for v in per_type.values())
    return get_p_r_f(tp, fp, fn)
