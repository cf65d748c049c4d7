"""WAND-vs-exhaustive crossover evidence at a non-toy corpus size.

At sf0.1 (5k docs) both query paths sit on the Spark job-dispatch
floor, so bench.py's per-query latencies can't show what block-max
pruning buys. This tool builds ONE index over the replicated corpus
(the same deterministic synthesis as tools/bench_scaling.py, default
24 replicas ≈ 120k docs) and times the bench query set on the same
engine with the physical path forced each way, verifying top-k
rank-identity between the paths at that scale (both are exact — the
cost pick is physical only).

Prints one JSON line:
  {"n_docs": N, "wand_p50": s, "exhaustive_p50": s, "speedup_p50": x,
   "rank_identical": true, "per_query": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402
from tools.bench_scaling import _make_corpus  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("WAND_BENCH_REPLICAS", "24"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import build_index
    from search_engine_spark.plans.query import QueryEngine
    from search_engine_spark.session import get_spark

    work = Path(tempfile.mkdtemp(prefix="se_wand_"))
    try:
        corpus = str(work / "corpus.parquet")
        # _make_corpus owns (and STOPS) its own session — run it before
        # creating ours
        n_docs = _make_corpus(sf_dir, corpus, replicas)
        spark = get_spark("bench-wand", cores=cores)
        spark.sparkContext.setLogLevel("ERROR")
        cfg = EngineConfig(build_waves=1, build_partitions=max(cores, 16))
        index_dir = str(work / "index")
        build_index(spark, corpus, index_dir, cfg=cfg)
        eng = QueryEngine(spark, index_dir, cfg=cfg)
        eng.docs.count()  # warm dims

        per_query: dict[str, dict] = {}
        walls = {"wand": [], "exhaustive": []}
        identical = True
        for i, q in enumerate(BENCH_QUERIES):
            res = {}
            for mode, flag in (("wand", True), ("exhaustive", False)):
                t0 = time.perf_counter()
                rows = eng.bm25(q, k=10, wand=flag).collect()
                dt = time.perf_counter() - t0
                walls[mode].append(dt)
                res[mode] = round(dt, 4)
                res[f"{mode}_ids"] = [r["doc_id"] for r in rows]
            if res["wand_ids"] != res["exhaustive_ids"]:
                identical = False
            per_query[f"q{i + 1}"] = {
                "wand": res["wand"], "exhaustive": res["exhaustive"]
            }
        wand_p50 = statistics.median(walls["wand"])
        exh_p50 = statistics.median(walls["exhaustive"])

        # function_score modifiers through the same crossover (VERDICT
        # r4 item 4): the claim that matters at scale is that the
        # modifier-capped WAND kernel keeps its lead over the exhaustive
        # decode ABOVE the crossover, like plain BM25 — not just that it
        # costs ~zero at sf0.1.
        from search_engine_spark.operators.scoremod import (
            DlSaturation,
            RecencyDecay,
        )

        modifiers = {}
        for mname, mk in (("decay", RecencyDecay), ("feature", DlSaturation)):
            mwalls = {"wand": [], "exhaustive": []}
            m_ident = True
            for q in BENCH_QUERIES:
                ids = {}
                for mode, flag in (("wand", True), ("exhaustive", False)):
                    t0 = time.perf_counter()
                    rows = eng.bm25(q, k=10, wand=flag, modifier=mk()).collect()
                    mwalls[mode].append(time.perf_counter() - t0)
                    ids[mode] = [r["doc_id"] for r in rows]
                if ids["wand"] != ids["exhaustive"]:
                    m_ident = False
            mw, me = (statistics.median(mwalls[m]) for m in
                      ("wand", "exhaustive"))
            modifiers[mname] = {
                "wand_p50": round(mw, 4),
                "exhaustive_p50": round(me, 4),
                "speedup_p50": round(me / mw, 3) if mw else None,
                "rank_identical": m_ident,
            }
            identical = identical and m_ident

        print(json.dumps({
            "n_docs": n_docs,
            "replicas": replicas,
            "cores": cores,
            "wand_p50": round(wand_p50, 4),
            "exhaustive_p50": round(exh_p50, 4),
            "speedup_p50": round(exh_p50 / wand_p50, 3) if wand_p50 else None,
            "rank_identical": identical,
            "modifiers": modifiers,
            "per_query": per_query,
        }))
        return 0 if identical else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
