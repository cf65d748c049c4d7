"""Predicate-pushdown barrier for verify-after-prune plans.

The trigram search paths (substring, regex) are "prune with the index,
verify with the expensive predicate on survivors only". Catalyst,
however, pushes deterministic single-side predicates through joins
(PushPredicateThroughJoin), so

    content.join(candidates, "doc_id", "left_semi").where(expensive)

gets rewritten to run ``expensive`` on EVERY content row before the
join — correct, but it turns an O(candidates) verify into an
O(corpus) regex scan, exactly what the index was built to avoid.
Catalyst has no expression-cost model, so it cannot know better.

``verify_after_join(cond)`` ORs the predicate with an always-false,
NON-DETERMINISTIC disjunct (``monotonically_increasing_id() < -1``;
the id is non-negative by construction). Non-deterministic predicates
are never pushed through joins and never constant-folded, so the
verify filter stays put — evaluated only on join survivors — while
the filter's value is unchanged. (``rand() < -1`` does not survive:
recent Sparks fold seeded rand comparisons.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def verify_after_join(cond: Column) -> Column:
    """``cond``, pinned in place: equal in value, but never pushed
    below the join it is written above."""
    return cond | (F.monotonically_increasing_id() < F.lit(-1))
