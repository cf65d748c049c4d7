"""CLI entry points — the engine's user-facing surface.

Mirrors the reference's manual harness (`services/engine/cmd/cli/main.go`
via `justfile:47-48`): build an index from a corpus table, then run a
query and print ``path: score`` per hit.

Usage:
    python -m search_engine_spark.cli build  <corpus.parquet> <index_dir> [--positions] [--trigrams] [--termvecs] [--suffixes] [--stem | --porter]
    python -m search_engine_spark.cli extend <corpus.parquet> <index_dir>
    python -m search_engine_spark.cli compact <index_dir>
    python -m search_engine_spark.cli delete  <index_dir> <doc_id...> | --query="q" [--min-match=N]
    python -m search_engine_spark.cli query  <index_dir> "<query>" [k] [--spell --page=N --mode=bm25|cosine --total --phrase --rescore --near=W [--ordered] --collapse=repo]
    python -m search_engine_spark.cli substring <index_dir> <corpus.parquet> "<needle>" [k]
    python -m search_engine_spark.cli regex  <index_dir> <corpus.parquet> "<pattern>" [k]
    python -m search_engine_spark.cli suggest <index_dir> <prefix> [k]
    python -m search_engine_spark.cli mlt    <index_dir> <doc_id> [k]   (needs build --termvecs)
    python -m search_engine_spark.cli count  <index_dir> "<query>" [--min-match=N]
    python -m search_engine_spark.cli demo   <corpus.parquet> "<query>" [k]
    python -m search_engine_spark.cli ingest <corpus_dir> <index_dir> [--follow] [--prior-every=N] [--auto-compact]
    python -m search_engine_spark.cli verify <index_dir>
    python -m search_engine_spark.cli segments <index_dir>

``verify`` audits a persisted index against its per-partition lineage
(plans/audit.py checks C1-C7: coverage, counts, sha-XOR digests, orphan
postings, block density, corpus stats); exit 1 on any mismatch.

``extend`` ingests a new corpus batch into an existing index as its
own generation — only the delta is tokenized and block-encoded; docs
already indexed are skipped (upsert), like the reference's claim loop.

``ingest`` is the streaming flavor: watch ``corpus_dir`` for new
parquet files and ingest each micro-batch as a generation (drains the
backlog and stops; ``--follow`` keeps tailing like the reference's
always-on spider/indexer loop).

Query flags (reference-parity surface):
    --spell         edit-distance-1 vocabulary spell correction (≤3
                    suggestions/word, the aspell-path analogue)
    --fuzzy=2       ED-2 correction (Lucene FuzzyQuery maxEdits=2;
                    SymSpell depth-2 deletion index, distance-first rank)
    --must=a,b      per-term MUST clauses (Lucene BooleanQuery MUST:
                    doc must contain every listed term; they score too)
    --qs            Lucene-style query-string syntax: +must -not
                    term* *term term~2 term^2.5 lang:py path:src/*
                    "quoted phrase words"
    --page=N        result page (LIMIT k OFFSET N·k, store.go:85-98)
    --mode=cosine   reference-compat TF-IDF-cosine ranking (tf-idf.go)
    --total         also print the total-hits count (GetTotalPages)
    --rescore       two-phase ranking: BM25 top-30 window, then an
                    exact-phrase adjacency bonus from the positional
                    sidecar (needs --positions at build time)
    --phrase        exact-phrase retrieval (needs an index built with
                    store_positions; build flag: --positions)
    --near=W        proximity NEAR(a, b, W) over the first two query
                    words (positional index); --ordered = a before b
    --min-match=M   keep only docs matching ≥ M query terms (Lucene
                    minimumNumberShouldMatch; M = #terms is AND)
    --not=a,b       MUST_NOT: drop docs containing any listed term
    --syn=a|b,c     synonym groups — variants separated by '|', groups
                    by ','; each group scores as one blended pseudo-term
                    (SynonymQuery, exact union-df)
    --explain       per-term score breakdown for the top-k hits
                    (Lucene explain(): tf, df, dl, idf, tfnorm, partial)
    --prf           pseudo-relevance-feedback expansion (needs build
                    --termvecs): top-5 hits' term vectors vote 3
                    expansion terms, re-query with them at weight 0.5
    --score=decay   ES function_score blends that KEEP block-max WAND
    --score=feature pruning (operators/scoremod.py): exponential
                    recency decay multiplier / rank-feature saturation
                    on the stored doc length
"""

from __future__ import annotations

import sys


def _demo(corpus_path: str, query: str, k: int) -> None:
    from search_engine_spark.operators.postings import (
        build_postings,
        build_terms,
        corpus_stats,
    )
    from search_engine_spark.operators.scoring import bm25_topk
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import (
        docs_table,
        load_corpus,
        with_identity,
    )

    spark = get_spark("se-cli")
    corpus = with_identity(load_corpus(spark, corpus_path))
    n_docs = corpus.count()
    postings = build_postings(corpus).persist()
    terms = build_terms(postings, n_docs)
    stats = corpus_stats(postings, n_docs)
    print(f"corpus: {n_docs} docs, avgdl={stats['avgdl']:.2f}")
    rows = bm25_topk(postings, terms, docs_table(corpus), query, stats["avgdl"], k=k).collect()
    if not rows:
        print("(no hits)")
    for r in rows:
        print(f"{r['path']}: {r['score']:.6f}  (matched {r['matched']}, doc {r['doc_id']})")


def _build(corpus_path: str, index_dir: str, positions: bool = False,
           trigrams: bool = False, termvecs: bool = False,
           stem: bool = False, suffixes: bool = False) -> None:
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import build_index
    from search_engine_spark.session import get_spark

    spark = get_spark("se-build")
    cfg = EngineConfig(store_positions=positions, store_trigrams=trigrams,
                       store_termvecs=termvecs, stem=stem,
                       store_suffixes=suffixes)
    summary = build_index(spark, corpus_path, index_dir, cfg=cfg)
    print(summary)


def _extend(corpus_path: str, index_dir: str) -> None:
    from search_engine_spark.plans.build import extend_index
    from search_engine_spark.session import get_spark

    spark = get_spark("se-extend")
    summary = extend_index(spark, corpus_path, index_dir)
    print(summary)


def _query(index_dir: str, query: str, k: int, spell: bool = False,
           fuzzy: int = 1, qs: bool = False, must: list[str] | None = None,
           page: int = 0, mode: str = "bm25", total: bool = False,
           phrase: bool = False, near: int = 0, ordered: bool = False,
           min_match: int = 1, exclude: list[str] | None = None,
           syn: str = "", explain: bool = False,
           rescore: bool = False, collapse: str = "",
           prf: bool = False, score: str = "") -> None:
    from search_engine_spark.plans.query import QueryEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("se-query")
    eng = QueryEngine(spark, index_dir)
    if score:
        from search_engine_spark.operators.scoremod import (
            DlSaturation,
            RecencyDecay,
        )

        mod = {"decay": RecencyDecay, "feature": DlSaturation}[score]()
        rows = eng.bm25(query, k=k, page=page, modifier=mod).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  ({score}-bm25, matched "
                  f"{r['matched']}, doc {r['doc_id']})")
        return
    if qs:
        from search_engine_spark.functions.querylang import parse_query

        p = parse_query(query)
        print(f"parsed: should={p.terms} must={p.require} "
              f"not={p.exclude} phrases={p.phrases} fuzzy~{p.fuzzy} "
              f"boosts={p.boosts} fields={p.fields}")
        rows = eng.bm25(
            p.query_string(), k=k, page=page,
            require=p.require or None, exclude=p.exclude or None,
            spell=p.fuzzy > 0, fuzzy=max(p.fuzzy, 1),
            min_match=min_match, boost=p.boosts or None,
            field=p.fields or None, phrases=p.phrases or None,
        ).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (qs-bm25, matched "
                  f"{r['matched']}, doc {r['doc_id']})")
        return
    if explain:
        rows = eng.explain(query, k=k).collect()
        if not rows:
            print("(no hits)")
        for r in sorted(rows, key=lambda r: (-r["score"], r["doc_id"], r["term"])):
            print(f"doc {r['doc_id']} score {r['score']:.4f} <- "
                  f"'{r['term']}' partial {r['partial']:.4f} "
                  f"(tf {r['tf']}, df {r['df']}, dl {r['dl']}, "
                  f"idf {r['idf']:.4f}, tfnorm {r['tfn']:.4f})")
        return
    if prf:
        rows = eng.bm25_prf(query, k=k, page=page).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (prf-bm25, matched "
                  f"{r['matched']}, doc {r['doc_id']})")
        return
    if syn:
        groups = [g.split("|") for g in syn.split(",") if g]
        rows = eng.bm25_syn(groups, k=k, page=page).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (syn-bm25, matched "
                  f"{r['matched']} of {len(groups)} groups, doc {r['doc_id']})")
        return
    if min_match > 1 or exclude or must or collapse:
        rows = eng.bm25(query, k=k, page=page, min_match=min_match,
                        exclude=exclude, require=must,
                        collapse=collapse or None).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            grp = f", {collapse} {r[collapse]}" if collapse else ""
            print(f"{r['path']}: {r['score']:.6f}  (bool-bm25, matched "
                  f"{r['matched']}, doc {r['doc_id']}{grp})")
        return
    if near:
        a, b = query.split()[:2]
        rows = eng.near(a, b, window=near, k=k, ordered=ordered).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (near x{r['pf']}, "
                  f"doc {r['doc_id']})")
        return
    if rescore:
        rows = eng.rescore(query, k=k).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['final']:.6f}  (bm25 {r['score']:.6f} "
                  f"+ phrase x{r['pf']}, doc {r['doc_id']})")
        return
    if phrase:
        rows = eng.phrase(query, k=k).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (phrase x{r['pf']}, "
                  f"doc {r['doc_id']})")
        return
    if spell:
        # analyzer-aware tokenization (matches bm25(spell=True)): on a
        # stemmed index, raw plurals are in-vocabulary only after the
        # stem — checking the unstemmed form would mangle correct terms
        expanded = eng.expand_query_terms(eng._qterms(query), max_edit=fuzzy)
        print(f"query terms after spell correction: {expanded}")
        query = " ".join(expanded)
    rows = eng.search(query, k=k, page_num=page, mode=mode).collect()
    if not rows:
        print("(no hits)")
    for r in rows:
        label = r.asDict().get("title") or r["path"]
        print(f"{label}: {r['global_score']:.6f}  (bm25 {r['score']:.4f}, "
              f"matched {r['matched']}, {r['path']})")
    if total:
        print(f"total hits: {eng.total_hits(query)}")


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    cmd = argv[1]
    flags = [a for a in argv if a.startswith("--")]
    args = [a for a in argv if not a.startswith("--")]
    if cmd == "demo":
        _demo(args[2], args[3], int(args[4]) if len(args) > 4 else 10)
    elif cmd == "build":
        _build(args[2], args[3], positions="--positions" in flags,
               trigrams="--trigrams" in flags,
               termvecs="--termvecs" in flags,
               stem="porter" if "--porter" in flags
               else "--stem" in flags,
               suffixes="--suffixes" in flags)
    elif cmd == "extend":
        _extend(args[2], args[3])
    elif cmd == "compact":
        from search_engine_spark.plans.build import compact_index
        from search_engine_spark.session import get_spark

        print(compact_index(get_spark("se-compact"), args[2]))
    elif cmd == "delete":
        from search_engine_spark.plans.build import delete_docs
        from search_engine_spark.session import get_spark

        q = next((f.split("=", 1)[1] for f in flags
                  if f.startswith("--query=")), None)
        if q is not None:
            # ES delete_by_query: tombstone EVERY live match
            from search_engine_spark.plans.query import QueryEngine

            spark = get_spark("se-delete")
            mm = next((int(f.split("=", 1)[1]) for f in flags
                       if f.startswith("--min-match=")), 1)
            ids = QueryEngine(spark, args[2]).matching_ids(q, min_match=mm)
            n = delete_docs(spark, args[2], ids)
        else:
            n = delete_docs(get_spark("se-delete"), args[2],
                            [int(d) for d in args[3:]])
        print(f"tombstones: {n} (run compact to drop physically)")
    elif cmd == "verify":
        from search_engine_spark.plans.audit import verify_index
        from search_engine_spark.session import get_spark

        report = verify_index(get_spark("se-verify"), args[2])
        print(report)
        return 0 if report["ok"] else 1
    elif cmd == "ingest":
        from search_engine_spark.session import get_spark
        from search_engine_spark.streaming.ingest import stream_ingest

        prior_n = next((int(f.split("=", 1)[1]) for f in flags
                        if f.startswith("--prior-every=")), 1)
        q = stream_ingest(get_spark("se-ingest"), args[2], args[3],
                          available_now="--follow" not in flags,
                          prior_every_n_batches=prior_n,
                          auto_compact="--auto-compact" in flags)
        q.awaitTermination()
        print("ingest stream drained" if "--follow" not in flags else "stopped")
    elif cmd == "substring":
        from search_engine_spark.plans.query import QueryEngine
        from search_engine_spark.session import get_spark

        eng = QueryEngine(get_spark("se-substring"), args[2])
        rows = eng.substring(args[4], args[3],
                             k=int(args[5]) if len(args) > 5 else 10).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: substring x{r['n_occ']}  (doc {r['doc_id']})")
    elif cmd == "suggest":
        from search_engine_spark.plans.query import QueryEngine
        from search_engine_spark.session import get_spark

        eng = QueryEngine(get_spark("se-suggest"), args[2])
        rows = eng.suggest(args[3],
                           k=int(args[4]) if len(args) > 4 else 5).collect()
        if not rows:
            print("(no suggestions)")
        for r in rows:
            print(f"{r['term']}  (df {r['df']})")
    elif cmd == "count":
        from search_engine_spark.plans.query import QueryEngine
        from search_engine_spark.session import get_spark

        mm = next((int(f.split("=", 1)[1]) for f in flags
                   if f.startswith("--min-match=")), 1)
        eng = QueryEngine(get_spark("se-count"), args[2])
        print(eng.matching_ids(args[3], min_match=mm).count())
    elif cmd == "mlt":
        from search_engine_spark.plans.query import QueryEngine
        from search_engine_spark.session import get_spark

        eng = QueryEngine(get_spark("se-mlt"), args[2])
        rows = eng.more_like_this(
            int(args[3]), k=int(args[4]) if len(args) > 4 else 10
        ).collect()
        if not rows:
            print("(no similar docs)")
        for r in rows:
            print(f"{r['path']}: {r['score']:.6f}  (mlt, matched "
                  f"{r['matched']}, doc {r['doc_id']})")
    elif cmd == "segments":
        from search_engine_spark.plans.audit import index_segments
        from search_engine_spark.session import get_spark

        for row in index_segments(get_spark("se-segments"), args[2]):
            if row["gen"] >= 0:
                print(f"gen {row['gen']}: {row['n_docs']} docs, "
                      f"{row['n_postings']} postings over {row['n_terms']} "
                      f"terms, {row['n_blocks']} blocks "
                      f"({row['n_encoded_postings']} encoded)")
            else:
                print(f"index: {row['n_segments']} segment(s), "
                      f"{row['n_docs']} live docs, "
                      f"{row['n_tombstones']} tombstones, "
                      f"analyzer={row['analyzer']}, avgdl={row['avgdl']}")
    elif cmd == "regex":
        from search_engine_spark.plans.query import QueryEngine
        from search_engine_spark.session import get_spark

        eng = QueryEngine(get_spark("se-regex"), args[2])
        rows = eng.regex(args[4], args[3],
                         k=int(args[5]) if len(args) > 5 else 10).collect()
        if not rows:
            print("(no hits)")
        for r in rows:
            print(f"{r['path']}: regex x{r['n_match']}  (doc {r['doc_id']})")
    elif cmd == "query":
        page = next((int(f.split("=", 1)[1]) for f in flags if f.startswith("--page=")), 0)
        mode = next((f.split("=", 1)[1] for f in flags if f.startswith("--mode=")), "bm25")
        score_flag = next((f.split("=", 1)[1] for f in flags
                           if f.startswith("--score=")), "")
        if score_flag and score_flag not in ("decay", "feature"):
            print(f"unknown --score value {score_flag!r} "
                  "(expected: decay, feature)")
            print(__doc__)
            return 2
        _query(args[2], args[3], int(args[4]) if len(args) > 4 else 10,
               spell="--spell" in flags or any(f.startswith("--fuzzy=") for f in flags),
               fuzzy=next((int(f.split("=", 1)[1]) for f in flags
                           if f.startswith("--fuzzy=")), 1),
               page=page, mode=mode,
               total="--total" in flags, phrase="--phrase" in flags,
               near=next((int(f.split("=", 1)[1]) for f in flags
                          if f.startswith("--near=")), 0),
               ordered="--ordered" in flags,
               min_match=next((int(f.split("=", 1)[1]) for f in flags
                               if f.startswith("--min-match=")), 1),
               exclude=next((f.split("=", 1)[1].split(",") for f in flags
                             if f.startswith("--not=")), None),
               must=next((f.split("=", 1)[1].split(",") for f in flags
                          if f.startswith("--must=")), None),
               qs="--qs" in flags,
               syn=next((f.split("=", 1)[1] for f in flags
                         if f.startswith("--syn=")), ""),
               explain="--explain" in flags,
               rescore="--rescore" in flags,
               collapse=next((f.split("=", 1)[1] for f in flags
                              if f.startswith("--collapse=")), ""),
               prf="--prf" in flags,
               score=score_flag)
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
