"""Permutation scorer for zero-shot story ordering (pure numpy, host-side).

Parity target: downstream/sort_story/score_permutations.py (reference).
For each story and each of the 5! = 120 candidate orderings, sum the
log-probs of the pairwise cells the ordering implies (eq where positions
match, lt/gt otherwise), pick the argmax, then report Spearman correlation,
absolute distance, and pairwise accuracy against the identity order.
Optionally compares against a baseline predictions tsv (e.g. CLIP).
"""

from __future__ import annotations

import argparse
import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np


def score_permutation(probs: np.ndarray, xa_perm: Sequence[int],
                      xb_perm: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """probs [g, g, 3] (classes: same / a<b / a>b) -> (eq, gtlt) prob mats."""
    g = len(xa_perm)
    eq = np.ones((g, g))
    gtlt = np.ones((g, g))
    for i, ti in enumerate(xa_perm):
        for j, tj in enumerate(xb_perm):
            if ti == tj:
                eq[i, j] = probs[i, j, 0]
            elif ti < tj:
                gtlt[i, j] = probs[i, j, 1]
            else:
                gtlt[i, j] = probs[i, j, 2]
    return eq, gtlt


def best_permutation(probs: np.ndarray, g: int = 5) -> Tuple[int, ...]:
    best, best_score = None, -np.inf
    for perm in itertools.permutations(range(g)):
        eq, gtlt = score_permutation(probs, np.arange(g), perm)
        score = np.log(eq).sum() + np.log(gtlt).sum()
        if score > best_score:
            best, best_score = perm, score
    return best


# -- metrics (reference: :31-45) -------------------------------------------
def spearman_acc(story: Sequence[int]) -> float:
    from scipy import stats
    return stats.spearmanr(story, list(range(len(story))))[0]


def absolute_distance(story: Sequence[int]) -> float:
    return float(np.mean(np.abs(np.asarray(story) - np.arange(len(story)))))


def pairwise_acc(story: Sequence[int]) -> float:
    n = len(story)
    correct = sum(1 for i in range(n) for j in range(i + 1, n)
                  if story[i] < story[j])
    return correct / (n * (n - 1) // 2)


def evaluate_stories(stories: List[Sequence[int]]) -> Dict[str, float]:
    return {
        "spearman": float(np.mean([spearman_acc(s) for s in stories])),
        "absolute_distance": float(np.mean([absolute_distance(s) for s in stories])),
        "pairwise": float(np.mean([pairwise_acc(s) for s in stories])),
    }


def score_h5(h5_path: str, modality: str = "lang_viz") -> Dict[str, float]:
    import h5py
    stories = []
    with h5py.File(h5_path, "r") as h5:
        for k in sorted(h5.keys(), key=int):
            probs = np.asarray(h5[k][f"{modality}_probs"])
            stories.append(best_permutation(probs))
    return evaluate_stories(stories)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("h5_path")
    ap.add_argument("--baseline_tsv", default=None,
                    help="optional baseline predictions tsv (comma-separated orders)")
    args = ap.parse_args()

    metrics = score_h5(args.h5_path)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")

    if args.baseline_tsv:
        import pandas as pd
        base = (pd.read_csv(args.baseline_tsv, delimiter="\t", names=["story"])
                ["story"].apply(lambda x: [int(y) for y in x.split(",")]).tolist())
        print("baseline:")
        for k, v in evaluate_stories(base).items():
            print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
