"""Function-score modifiers that ride the WAND kernel (VERDICT r3
item 3): ES ``function_score`` shapes — recency decay, rank-feature
saturation — as per-doc score transforms whose UPPER BOUND the kernel
can cap per segment, so scoring blends keep block-max pruning instead
of forcing the exhaustive path.

Exactness argument
------------------
WAND prunes a segment when its upper bound falls below θ (the k-th
best exact FINAL score so far). With a modifier, the final score is
``f(doc, bm25)``; pruning stays exact iff the kernel's per-segment
bound dominates every final score in the segment:

- multiplicative (``RecencyDecay``): final = bm25·mult(doc) with
  0 < mult ≤ 1. Per segment [lo, hi) the cap is
  ``seg_ub · max_{doc∈[lo,hi)} mult(doc)``. The pseudo-age is
  ``doc_id mod AGE_MOD`` and blocks cover CONTIGUOUS doc ranges, so
  the max multiplier over a segment is closed-form: a segment narrower
  than the modulus that doesn't wrap through 0 has min-age = lo mod m
  (mult is non-increasing in age); anything wider or wrapping reaches
  age 0 → cap 1. That per-segment cap is strictly tighter than a
  global cap whenever the segment's doc range excludes young ages —
  the "partition's max multiplier" design named in
  ops/search_sql.bm25_topk_decay's docstring.
- additive (``DlSaturation``): final = bm25 + w·dl/(dl+pivot) with
  the saturation < 1, so ``seg_ub + w`` dominates. The feature (dl)
  is already stored per posting in the blocks — the kernel reads it
  from the same decode it scores with, no extra lookup.

Both modifiers expose the same protocol:

- ``needs_dl``     — kernel must carry per-doc dl to ``apply_np``
- ``seg_caps(bounds, seg_ub)`` — vectorized effective upper bounds
- ``apply_np(doc_ids, dls, scores)`` — exact final scores (NumPy)
- ``spark_score(score, doc_id, dl)`` — the same transform as a Column
  expression for the exhaustive path (property-tested identical)

The ops-layer SQL twins (``ops/search_sql.bm25_topk_decay`` /
``rank_feature_topk``) stay the DuckDB-checkable semantics reference;
this module is the compressed-index engine path for the same shapes
(the saturation feature here is the stored dl rather than the ops
table's n_chars column — documented difference, same algebra).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

DECAY_OFFSET_D = 30
DECAY_SCALE_D = 90
DECAY_RATE = 0.5
AGE_MOD = 365

RF_PIVOT = 256
RF_WEIGHT = 2.0


class RecencyDecay:
    """Multiplicative exponential recency decay (ES ``exp`` decay):
    mult = rate^(max(0, age − offset)/scale), age = doc_id mod m
    (non-negative on both engines via numpy mod / double-mod SQL)."""

    kind = "mult"
    needs_dl = False

    def __init__(self, offset_d: int = DECAY_OFFSET_D,
                 scale_d: int = DECAY_SCALE_D, rate: float = DECAY_RATE,
                 age_mod: int = AGE_MOD) -> None:
        assert 0.0 < rate <= 1.0, "decay rate must be in (0, 1]"
        self.offset_d = int(offset_d)
        self.scale_d = int(scale_d)
        self.rate = float(rate)
        self.age_mod = int(age_mod)

    def _mult_of_age(self, age: np.ndarray) -> np.ndarray:
        over = np.maximum(0.0, age.astype(np.float64) - self.offset_d)
        return np.exp(np.log(self.rate) * over / float(self.scale_d))

    def seg_caps(self, bounds: np.ndarray, seg_ub: np.ndarray) -> np.ndarray:
        """Effective per-segment upper bounds: seg_ub · max-mult over
        each segment's contiguous doc range (closed-form, no decode)."""
        lo = bounds[:-1].astype(np.int64)
        width = (bounds[1:] - bounds[:-1]).astype(np.int64)
        a0 = np.mod(lo, self.age_mod)  # numpy mod: non-negative
        # min age over [lo, hi): a0 unless the range wraps through 0
        wraps = (width >= self.age_mod) | (a0 + width > self.age_mod)
        min_age = np.where(wraps, 0, a0)
        return seg_ub * self._mult_of_age(min_age)

    def apply_np(self, doc_ids: np.ndarray, dls: np.ndarray | None,
                 scores: np.ndarray) -> np.ndarray:
        age = np.mod(doc_ids.astype(np.int64), self.age_mod)
        return scores * self._mult_of_age(age)

    def spark_score(self, score: Column, doc_id: Column,
                    dl: Column | None) -> Column:
        m = self.age_mod
        age = (doc_id % m + m) % m
        mult = F.exp(
            F.log(F.lit(self.rate))
            * F.greatest(F.lit(0.0), (age - self.offset_d).cast("double"))
            / F.lit(float(self.scale_d))
        )
        return score * mult


class DlSaturation:
    """Additive rank-feature saturation (Lucene
    FeatureField#newSaturationQuery) over the stored document length:
    final = bm25 + w·dl/(dl+pivot). The feature contribution is
    bounded by w, so ``seg_ub + w`` is a valid segment cap."""

    kind = "add"
    needs_dl = True

    def __init__(self, weight: float = RF_WEIGHT,
                 pivot: float = RF_PIVOT) -> None:
        assert weight >= 0.0
        self.weight = float(weight)
        self.pivot = float(pivot)

    def seg_caps(self, bounds: np.ndarray, seg_ub: np.ndarray) -> np.ndarray:
        return seg_ub + self.weight

    def apply_np(self, doc_ids: np.ndarray, dls: np.ndarray | None,
                 scores: np.ndarray) -> np.ndarray:
        assert dls is not None
        d = dls.astype(np.float64)
        return scores + self.weight * d / (d + self.pivot)

    def spark_score(self, score: Column, doc_id: Column,
                    dl: Column | None) -> Column:
        assert dl is not None
        d = dl.cast("double")
        return score + F.lit(self.weight) * d / (d + F.lit(self.pivot))
