"""Query plan: tokenize → pruned index scan → score → (blend) → top-k.

Spark shape (SURVEY §3.1): the query string is tokenized driver-side
(same frozen tokenizer §8.1, distinct terms); term buckets are computed
driver-side with the Python XXH64 twin of Spark's xxhash64, so the scan
filter ``bucket IN (...) AND term IN (...)`` prunes index *directories*
first and parquet row groups second — the DataFrame analogue of the
reference's B-tree probe (`migration/schema.sql:62-66`).

Two modes:
- ``bm25``   (primary, north_star): pure BM25 disjunctive top-k.
  ``wand=True`` routes through the block-max WAND operator (per-salt
  exact top-k + k-row global merge); ``wand=False`` decodes matching
  blocks and scores exhaustively (vectorized) — same results, property-
  tested against each other. ``wand=None`` (default) picks by cost:
  the terms-dim lookup already returns Σ df (the exact candidate
  posting volume), so small queries take the single narrow exhaustive
  pass (the WAND fan-out's salt exchange + Python groups cost more
  than decoding everything) and big ones take WAND, where block-max
  pruning pays. The cost pick is driver-side, zero extra jobs — the
  same flavor of decision AQE makes between broadcast and SMJ.
- ``search`` (reference-compat §8.4): candidate page by (matched DESC,
  prior DESC, doc_id ASC) truncated to 20, min-max normalize BM25
  within the page, blend 0.5/0.5 with the PageRank prior, final
  deterministic order. Candidate selection ignores BM25 order, so
  score-pruning doesn't apply — this path is always exhaustive, like
  the reference's SQL (`store.go:59-90`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.inline import inline_table
from search_engine_spark.functions.tokenize import (
    analyze_token,
    query_terms,
)
from search_engine_spark.functions.xxhash import spark_xxhash64_str
from search_engine_spark.operators.compress import decode_blocks
from search_engine_spark.operators.scoring import partial_scores, rank_order
from search_engine_spark.operators.wand import wand_topk
from search_engine_spark.plans.build import read_stats, read_tombstones


class QueryEngine:
    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: EngineConfig | None = None, cache_docs: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        self.cfg = cfg or EngineConfig()
        self.stats = read_stats(spark, index_dir)
        self.blocks = spark.read.parquet(f"{index_dir}/blocks")
        self.terms = spark.read.parquet(f"{index_dir}/terms")
        docs = spark.read.parquet(f"{index_dir}/docs")
        # result-metadata surface (title/description/repo/lang/commit/
        # keywords — the reference's rendered-result struct,
        # entity.go:16-26); columns absent on indexes built by earlier
        # rounds degrade away rather than fail
        meta_cols = [
            c
            for c in ("title", "description", "repo", "lang", "commit",
                      "keywords")
            if c in docs.columns
        ]
        self.docs = docs.select("doc_id", "path", *meta_cols)
        self._meta_cols = meta_cols
        self.prior = spark.read.parquet(f"{index_dir}/prior").withColumnRenamed(
            "score", "prior"
        )
        if cache_docs:
            # small dimension tables a query service keeps hot
            # (SURVEY §4: cache terms + prior at service start)
            self.docs = self.docs.cache()
            self.prior = self.prior.cache()
        self._del_ix: DataFrame | None = None
        self._del_ix2: DataFrame | None = None
        # Lucene-model deletes: tombstoned docs are excluded from every
        # result immediately; postings/stats still contain them until
        # compact_index physically drops them (documented divergence of
        # df/avgdl between delete and compact, same as Lucene segments)
        self.tombstones = read_tombstones(spark, index_dir).cache()
        self._n_tombs = self.tombstones.count()

    def _live(self, scored: DataFrame) -> DataFrame:
        """Drop tombstoned docs from a (doc_id, ...) relation."""
        if not self._n_tombs:
            return scored
        return scored.join(F.broadcast(self.tombstones), "doc_id", "left_anti")

    @property
    def _analyzer(self) -> str:
        return self.stats.get("analyzer", "plain")

    def _analyze(self, t: str) -> str:
        """The index's scalar analysis stage (s-stem / porter / none)."""
        return analyze_token(t, self._analyzer)

    def _qterms(self, query: str) -> list[str]:
        """Query-side analysis chain: frozen tokenizer, then — iff the
        index was built with ``EngineConfig.stem`` (stats.json
        ``analyzer``: the s-stemmer or full Porter) — the same stemmer
        the build kernels applied, so query terms land in the index's
        term space (Lucene analyzer symmetry). Wildcard/prefix/suggest
        probes bypass the stemmer, exactly like Lucene's un-analyzed
        multi-term queries — they match the stemmed vocabulary
        literally."""
        terms = query_terms(query)
        if self._analyzer != "plain":
            terms = sorted({self._analyze(t) for t in terms})
        return terms

    def _alist(self, terms: list[str]) -> list[str]:
        """Analyze an explicit term list (require/exclude/syn): dedupe,
        sort, and — on a stemmed index — stem each term."""
        if self._analyzer != "plain":
            return sorted({self._analyze(t) for t in terms})
        return sorted(set(terms))

    def _qtokens(self, query: str) -> list[str]:
        """Ordered, non-deduping analysis (phrase legs): frozen
        tokenizer + the index's stemmer, position-preserving."""
        from search_engine_spark.functions.tokenize import tokenize

        toks = tokenize(query)
        if self._analyzer != "plain":
            toks = [self._analyze(t) for t in toks]
        return toks

    # ---- helpers ----
    @staticmethod
    def _meta_type(col: str) -> str:
        """DDL type of a result-metadata column (empty-result schemas)."""
        return "array<string>" if col == "keywords" else "string"

    def _buckets(self, terms: list[str]) -> list[int]:
        nb = int(self.stats["term_buckets"])
        return sorted({spark_xxhash64_str(t) % nb for t in terms})

    def _term_info(self, terms: list[str]) -> tuple[dict[str, float], int]:
        """One pruned scan of the terms dim → ({term: idf}, Σ df).
        Σ df is the exact candidate posting volume, used for the
        cost-based wand/exhaustive routing at zero extra jobs."""
        if not terms:
            return {}, 0
        rows = self.terms.where(F.col("term").isin(terms)).collect()
        return {r["term"]: r["idf"] for r in rows}, sum(r["df"] for r in rows)

    def _idf_map(self, terms: list[str]) -> dict[str, float]:
        return self._term_info(terms)[0]

    def _query_blocks(self, terms: list[str]) -> DataFrame:
        return self.blocks.where(
            F.col("bucket").isin(self._buckets(terms)) & F.col("term").isin(terms)
        )

    def _wand_blocks(self, terms: list[str]) -> DataFrame:
        """Query blocks prepared for the per-salt WAND fan-out.

        Rare terms are stored UNSALTED (salt = -1, df-adaptive layout,
        operators/compress.py): their blocks span the whole doc_id axis,
        so they are replicated into every salt group (tiny: ≤ df/block
        rows per term by construction). Exactness: group s then holds
        every posting of every doc in salt range s (aligned blocks for
        frequent terms + replicated blocks for rare ones), so the per-
        group top-k still scores those docs fully; docs OUTSIDE range s
        appear with partial (underestimated) scores, which only shrink
        WAND's θ (prunes less) and are eliminated by the max-score merge
        in :func:`_merge_salt_topk` — a partial row can displace a full
        row from a group's top-k only when k docs with strictly higher
        full scores exist, in which case that row wasn't in the global
        top-k anyway."""
        blk = self._query_blocks(terms)
        salted = blk.where(F.col("salt") >= 0)
        rare = blk.where(F.col("salt") == -1).drop("salt")
        nsalts = 1 << int(self.stats["salt_bits"])
        salts = self.spark.range(nsalts).select(
            F.col("id").cast("int").alias("salt")
        )
        return salted.unionByName(
            rare.crossJoin(F.broadcast(salts)).select(*salted.columns)
        )

    @staticmethod
    def _merge_salt_topk(scored: DataFrame) -> DataFrame:
        """Collapse duplicate per-salt rows to each doc's full score
        (max over (score, matched) — partial rows are dominated)."""
        return (
            scored.groupBy("doc_id")
            .agg(F.max(F.struct("score", "matched")).alias("sm"))
            .select("doc_id", "sm.score", "sm.matched")
        )

    def _empty_scored(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score double, matched int")

    def _scores_exhaustive(self, terms: list[str], idf_map: dict[str, float],
                           modifier=None) -> DataFrame:
        decoded = decode_blocks(self._query_blocks(terms))
        idf_df = inline_table(
            self.spark, [(t, float(i)) for t, i in idf_map.items()],
            "term string, idf double",
        )
        matched = decoded.join(F.broadcast(idf_df), "term")
        scored = partial_scores(matched, self.stats["avgdl"],
                                self.stats["k1"], self.stats["b"])
        aggs = [
            F.sum("partial").alias("score"),
            F.count("*").cast("int").alias("matched"),
        ]
        if modifier is not None and modifier.needs_dl:
            # dl is constant per doc; max is a cheap per-doc pick
            aggs.append(F.max("dl").alias("_dl"))
        out = scored.groupBy("doc_id").agg(*aggs)
        if modifier is not None:
            dl_col = F.col("_dl") if modifier.needs_dl else None
            out = out.select(
                "doc_id",
                modifier.spark_score(
                    F.col("score"), F.col("doc_id"), dl_col
                ).alias("score"),
                "matched",
            )
        return out

    def _idf_ref_map(self, terms: list[str]) -> dict[str, float]:
        """The reference's quirky idf (`services/ranking/src/idf.py:14-23`,
        Postgres 1-arg LOG base 10 + bigint integer division); OOV terms
        get 0.0 — the Go map-default the ranker relies on."""
        import math

        n = int(self.stats["n_docs"])
        rows = self.terms.where(F.col("term").isin(terms)).select("term", "df").collect()
        df_map = {r["term"]: r["df"] for r in rows}
        out = {}
        for t in terms:
            ratio = n // (df_map[t] + 1) if t in df_map else 0
            out[t] = math.log10(ratio) if ratio >= 1 else 0.0
        return out

    def _cosine_scores(self, terms: list[str], idf_ref: dict[str, float]) -> DataFrame:
        """TF-IDF cosine over the distinct query-word dimensions
        (`tf-idf.go:10-44`, `util.go:41-68`, `math-util.go:8-37`):
        dot = Σ tf·idf², |d| = √Σ(tf·idf)², |q| = √Σ idf² (all query
        words, OOV dims contribute 0). Guarded to 0 where a magnitude is
        0 (the reference would NaN)."""
        import math

        qmag = math.sqrt(sum(i * i for i in idf_ref.values()))
        decoded = decode_blocks(self._query_blocks(terms))
        idf_df = inline_table(
            self.spark, [(t, float(i)) for t, i in idf_ref.items()],
            "term string, idf double",
        )
        per_doc = (
            decoded.join(F.broadcast(idf_df), "term")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("tf") * F.col("idf") * F.col("idf")).alias("dot"),
                F.sqrt(F.sum(F.pow(F.col("tf") * F.col("idf"), 2))).alias("dmag"),
                F.count("*").cast("int").alias("matched"),
            )
        )
        score = F.when(
            (F.col("dmag") > 0) & (F.lit(qmag) > 0),
            F.col("dot") / (F.col("dmag") * F.lit(qmag)),
        ).otherwise(F.lit(0.0))
        return per_doc.select("doc_id", score.alias("score"), "matched")

    # ---- spell correction (reference spell-checker.go:27-57 analogue) ----
    def _deletion_index(self, depth: int = 1) -> DataFrame:
        """SymSpell-style vocabulary deletion index, built lazily and
        cached per depth: (variant, term, df) where variant ∈ {term} ∪
        its ≤``depth``-char deletions. Two strings are within edit
        distance d iff their depth-d deletion sets intersect (SymSpell's
        deletes-only guarantee), so OOV lookup is a broadcast join on
        ``variant`` + a cheap levenshtein verify — never a vocab scan
        per query (the scan would be O(|V|) per OOV word at 10^12-file
        vocab sizes). Depth 2 costs O(L²) variants per term (≤ ~300 at
        the 25-char cap) — the standard SymSpell space-for-time trade,
        built only when a caller first asks for ``max_edit=2``."""
        del1 = (
            "transform(sequence(1, length(term)),"
            " i -> concat(substring(term, 1, i-1),"
            " substring(term, i+1, length(term))))"
        )
        # delete positions p < q of the original in one expression
        del2 = (
            "IF(length(term) >= 2,"
            " flatten(transform(sequence(1, length(term) - 1),"
            "  p -> transform(sequence(p + 1, length(term)),"
            "   q -> concat(substring(term, 1, p-1),"
            "    substring(term, p+1, q-p-1),"
            "    substring(term, q+1, length(term)))))),"
            " array())"
        )
        if depth == 1:
            if self._del_ix is None:
                variants = F.expr(f"array_union(array(term), {del1})")
                self._del_ix = self.terms.select(
                    "term", "df", F.explode(variants).alias("variant")
                ).cache()
            return self._del_ix
        if self._del_ix2 is None:
            variants = F.expr(
                f"array_distinct(concat(array(term), {del1}, {del2}))"
            )
            self._del_ix2 = self.terms.select(
                "term", "df", F.explode(variants).alias("variant")
            ).cache()
        return self._del_ix2

    def expand_query_terms(self, terms: list[str], max_sugg: int = 3,
                           max_edit: int = 1) -> list[str]:
        """Vocabulary pass-through for known terms; for OOV terms, the
        ≤``max_sugg`` strongest vocabulary neighbors within edit
        distance ``max_edit`` — ED-1 ranked (df DESC, term ASC), the
        public analogue of the reference's aspell suggestions (≤3 per
        word, deduped); ``max_edit=2`` (Lucene FuzzyQuery's default
        maxEdits) ranks distance-first (lev ASC, df DESC, term ASC) so
        a near correction beats a frequent far one, served from the
        depth-2 deletion index — still a broadcast variant join, never
        a vocab scan."""
        if not terms:
            return []
        present = {
            r["term"]
            for r in self.terms.where(F.col("term").isin(terms))
            .select("term").collect()
        }
        oov = [t for t in terms if t not in present]
        if not oov:
            return sorted(present)

        def dels(t: str) -> set[str]:
            return {t[:i] + t[i + 1:] for i in range(len(t))}

        qv_set = {(t, v) for t in oov for v in {t, *dels(t)}}
        if max_edit >= 2:
            qv_set |= {
                (t, v2)
                for t in oov
                for v in dels(t)
                for v2 in dels(v)
            }
        qdf = inline_table(
            self.spark, sorted(qv_set), "qterm string, variant string"
        )
        cand = (
            self._deletion_index(depth=max_edit)
            .join(F.broadcast(qdf), "variant")
            .withColumn("lev", F.levenshtein("qterm", "term"))
            .where(F.col("lev").between(1, max_edit))
            .select("qterm", "term", "df", "lev")
            .distinct()
        )
        order = (
            [F.desc("df"), F.asc("term")]
            if max_edit == 1
            else [F.asc("lev"), F.desc("df"), F.asc("term")]
        )
        w = Window.partitionBy("qterm").orderBy(*order)
        sugg = {
            r["term"]
            for r in cand.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= max_sugg)
            .select("term").collect()
        }
        return sorted(present | sugg)

    # ---- wildcard prefix expansion + typeahead (Lucene PrefixQuery) ----
    def expand_prefix_terms(self, query: str, max_exp: int = 4) -> tuple[str, list[str]]:
        """Split a raw query into (literal remainder, expansion list):
        each trailing-``*`` token rewrites to its ``max_exp`` strongest
        dictionary terms (df DESC, term ASC — Lucene's boolean-rewrite
        expansion cap), and each leading-``*`` token (``*er``) to the
        ``max_exp`` strongest terms with that SUFFIX (Lucene's
        ReverseStringFilter semantics: a suffix is a prefix of the
        reversed term). The prefix condition is a contiguous range of
        the sorted terms table; the suffix condition prefers the
        ``terms_rev`` sidecar when the index was built with
        ``store_suffixes`` (build flag ``--suffixes``) — there it is a
        pushed StartsWith range scan on the reversed-sorted dictionary,
        exactly Lucene's reversed field — and degrades to a dictionary
        scan otherwise (vocabulary is Heaps-law sublinear in corpus
        size, so the scan stays affordable; the sidecar is the 10^12-doc
        path). The collect is bounded by ``max_exp × n_wildcards``."""
        words = query.split()
        prefixes = sorted({w[:-1].lower() for w in words
                           if w.endswith("*") and len(w) > 1})
        suffixes = sorted({w[1:].lower() for w in words
                           if w.startswith("*") and len(w) > 1
                           and not w.endswith("*")})
        rest = " ".join(w for w in words
                        if not (w.endswith("*") or w.startswith("*")))
        out: set[str] = set()
        if prefixes:
            p = inline_table(self.spark, [(x,) for x in prefixes], "pfx string")
            w = Window.partitionBy("pfx").orderBy(F.desc("df"), F.asc("term"))
            out.update(r["term"] for r in (
                self.terms.join(
                    F.broadcast(p), F.col("term").startswith(F.col("pfx"))
                )
                .withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= max_exp)
                .select("term")
                .collect()
            ))
        if suffixes:
            w = Window.partitionBy("sfx").orderBy(F.desc("df"), F.asc("term"))
            out.update(r["term"] for r in (
                self._suffix_candidates(suffixes)
                .withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= max_exp)
                .select("term")
                .collect()
            ))
        return rest, sorted(out)

    def _suffix_candidates(self, suffixes: list[str]) -> DataFrame:
        """(term, df, sfx) dictionary candidates for each suffix. With
        the ``terms_rev`` sidecar: literal StartsWith predicates on the
        reversed key push into the rterm-sorted parquet scan (row-group
        range prune — Lucene's reversed field); the broadcast join only
        tags each survivor with its suffix group for the per-suffix
        expansion cap. Without it: an endswith dictionary scan."""
        rt = self._reversed_terms()
        if rt is not None:
            pred = F.col("rterm").startswith(suffixes[0][::-1])
            for x in suffixes[1:]:
                pred = pred | F.col("rterm").startswith(x[::-1])
            s = inline_table(
                self.spark, [(x, x[::-1]) for x in suffixes],
                "sfx string, rsfx string",
            )
            return rt.where(pred).join(
                F.broadcast(s), F.col("rterm").startswith(F.col("rsfx"))
            )
        s = inline_table(self.spark, [(x,) for x in suffixes], "sfx string")
        return self.terms.join(
            F.broadcast(s), F.col("term").endswith(F.col("sfx"))
        )

    def _reversed_terms(self):
        """Lazy-load the reversed-dictionary sidecar (``terms_rev``,
        built with ``store_suffixes``); None when absent."""
        if not hasattr(self, "_rterms"):
            try:
                self._rterms = self.spark.read.parquet(
                    f"{self.index_dir}/terms_rev"
                )
            except Exception:  # noqa: BLE001 - sidecar not built
                self._rterms = None
        return self._rterms

    def suggest(self, prefix: str, k: int = 5) -> DataFrame:
        """Typeahead: top-``k`` dictionary terms with ``prefix`` by
        (df DESC, term ASC) → (term, df). Pure terms-table range scan —
        no postings, no content."""
        return (
            self.terms.where(F.col("term").startswith(prefix.lower()))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
        )

    def _offset_page(self, df: DataFrame, order: list, page: int, size: int) -> DataFrame:
        """LIMIT size OFFSET page·size with a scale-safe plan: top
        (page+1)·size via TakeOrderedAndProject, then a row_number
        filter over that bounded set (store.go:85-98 semantics).

        Guard: TakeOrderedAndProject sizes per-partition heaps by the
        limit, so an ask ≥ the corpus size (e.g. "give me everything,
        ranked") degenerates to a plain sort with no limit instead of
        allocating corpus-sized heaps per task."""
        want = (page + 1) * size
        n_docs = int(self.stats["n_docs"])
        if 0 < n_docs <= want:
            top = df.orderBy(*order)
        else:
            top = df.orderBy(*order).limit(want)
        if page == 0:
            return top
        w = Window.orderBy(*order)
        return (
            top.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > page * size)
            .drop("__rn")
        )

    # ---- primary: pure BM25 top-k ----
    def bm25(self, query: str, k: int = 10, wand: bool | None = None,
             spell: bool = False, fuzzy: int = 1, page: int = 0, min_match: int = 1,
             exclude: list[str] | None = None,
             require: list[str] | None = None,
             after: tuple[float, int, str, int] | None = None,
             collapse: str | None = None,
             boost: dict[str, float] | None = None,
             field: dict[str, str] | None = None,
             phrases: list[str] | None = None,
             modifier=None) -> DataFrame:
        """Disjunctive BM25 top-k. ``wand=None`` (default) picks the
        physical strategy by cost: exhaustive decode below
        ``cfg.wand_min_postings`` candidate postings, block-max WAND
        above (both exact — same results, property-tested). True/False
        force a path. Trailing-``*`` tokens expand against the term
        dictionary (``expand_prefix_terms``) before scoring.

        Boolean modes (Lucene BooleanQuery):

        - ``min_match`` ≥ 2 keeps only docs matching that many query
          terms (minimumNumberShouldMatch; len(terms) = AND).
        - ``exclude`` drops docs containing ANY of those terms
          (MUST_NOT): their posting lists are decoded (bucket+term
          pruned scan — never a content read) into a doc_id anti-join.
        - ``require`` keeps only docs containing EVERY one of those
          terms (MUST); required terms also join the scored term set
          (Lucene MUST contributes to score). Keeps block-max pruning
          (r3): the WAND kernel skips segments not covered by every
          required term and filters per-doc required counts before θ;
          the exhaustive path uses the pre-top-k posting-decode
          semi-join. An OOV required term empties the result, like
          Lucene.
        - ``boost`` maps terms to query-time weights (Lucene
          ``term^2.5``): each term's BM25 partial scales by its weight.
          Composes with every mode — including WAND, which stays exact
          because upper bounds derive from the scaled idf_map.
        - ``field`` maps metadata columns to values (Lucene FILTER
          clause, ``lang:py``): hits are restricted to docs matching
          every (column, value) pair, scores/stats unchanged (unlike a
          corpus-filtered rebuild, which recomputes df/avgdl). A
          trailing ``*`` in the value is a prefix match; ``keywords``
          matches by array membership; comparisons are caseless. Costs
          zero extra joins — the predicate runs on the metadata surface
          the result join materializes anyway. Forces the exhaustive
          path (the filter cuts candidates by data WAND can't see).
        - ``phrases`` (Lucene quoted phrases in a query string,
          ``"binary search" tree``): each phrase is a pre-top-k FILTER
          — only docs containing the exact in-order token sequence
          qualify — resolved against the positional sidecar
          (``store_positions=True``; raises without it). Phrase WORDS
          score through the ordinary disjunctive terms (the query-
          string parser includes them in the SHOULD set); the phrase
          itself contributes adjacency as a filter, not a virtual-term
          score (documented simplification of Lucene PhraseQuery
          scoring — ``phrase()``/``rescore()`` are the scored paths).
          Forces the exhaustive path like require/field.
        - ``modifier`` (ES function_score, r4 — operators/scoremod.py):
          a per-doc score transform — ``RecencyDecay`` (multiplicative
          exp decay on the doc_id-derived pseudo-age) or
          ``DlSaturation`` (additive rank-feature saturation on the
          stored document length). Does NOT force the exhaustive path:
          the WAND kernel caps segment upper bounds by the modifier
          (per-segment max multiplier for decay, +weight for
          saturation) and tracks θ over exact final scores, so
          function_score queries keep block-max pruning (VERDICT r3
          item 3; property-tested WAND ≡ exhaustive for both kinds).

        ``min_match`` keeps block-max pruning (r3, VERDICT item 3): the
        per-salt kernel is matched-count-aware — segments covered by
        fewer than ``min_match`` distinct terms' blocks are skipped
        without decoding, and θ tracks the k-th best score among
        QUALIFYING docs only (property-tested WAND ≡ exhaustive for
        min_match 1..#terms) — so conjunctive queries cost-route like
        disjunctive ones. ``exclude`` keeps pruning too (r3): the
        excluded terms' blocks ride the same per-salt fan-out (zero UB,
        zero score) and the kernel masks their docs before θ — exact
        because each group emits only home-salt docs, whose full
        posting set (positive AND excluded) it holds. ``after`` still
        forces the exhaustive path: the cursor key involves the docs
        join, which the kernel can't see.

        ``after`` is a keyset cursor (ES search_after / Lucene
        ``collapse`` names a result column (``repo``, ``lang``, ``path``
        or any metadata column) and keeps at most ONE hit per distinct
        value — the best under the frozen rank order (ES ``collapse`` /
        Lucene grouping: "best file per repo"). The per-group best is an
        aggregation of an orderable struct mirroring the rank order
        (map-side partial combine — a hot repo is one combiner cell,
        never a single-task window partition); the global top-k follows
        as usual. Collapse must see the FULL match set before any
        top-k, so it forces the exhaustive path like ``exclude``, and
        it composes with ``page`` (OFFSET over collapsed results) but
        not ``after`` (a pre-collapse cursor would resurface a group
        whose best hit was already served).

        ``after`` is a keyset cursor (ES search_after / Lucene
        searchAfter): the frozen-order sort key
        ``(score, matched, path, doc_id)`` of the last hit already
        served — the next page is the top-k strictly after it. Unlike
        ``page`` (OFFSET semantics, O(page·k) rows materialized per
        request), the cursor predicate prunes before the top-k, so deep
        pagination costs the same as page 1; doc_id uniqueness makes
        the order total, so pages never skip or repeat. Routed through
        the exhaustive path for the same pre-top-k exactness reason as
        the boolean filters."""
        if "*" in query:
            query, expansions = self.expand_prefix_terms(query)
            terms = sorted({*self._qterms(query), *expansions})
        else:
            terms = self._qterms(query)
        if spell:
            terms = self.expand_query_terms(terms, max_edit=fuzzy)
        # boolean/boost term lists pass through the index's analyzer
        # too (Lucene analyzes every clause of the query string): on a
        # stemmed index `+trees` must hit the 'tree' posting list
        exclude = self._alist(exclude or [])
        require = self._alist(require or [])
        if boost and self._analyzer != "plain":
            merged: dict[str, float] = {}
            for t, w in boost.items():
                s = self._analyze(t)
                # variants folding onto one stem keep the strongest
                # boost (deterministic; Lucene would sum clause scores,
                # but our boost is a per-term weight, not a clause)
                merged[s] = max(merged.get(s, 0.0), float(w))
            boost = merged
        if require:
            # Lucene MUST: required terms both filter AND score
            terms = sorted({*terms, *require})
        if collapse is not None and after is not None:
            raise ValueError("collapse does not compose with an `after` "
                             "cursor (see docstring)")
        idf_map, sum_df = self._term_info(terms)
        if boost:
            # Lucene query-time boost ≡ scaling the term's idf: both the
            # exhaustive partials AND the WAND upper bounds derive from
            # idf_map at query time (wand.py computes ub = idf·block_max
            # per call), so a per-term scale keeps block-max pruning
            # exact — no kernel change, no index change.
            idf_map = {t: i * float(boost.get(t, 1.0))
                       for t, i in idf_map.items()}
        if after is not None or collapse is not None or field or phrases:
            # these filters cut the candidate set by data WAND can't see
            # (the cursor sort key / the full pre-collapse match set /
            # metadata values / positional adjacency) — pre-top-k
            # exactness forces the exhaustive path. require no longer
            # does (r3): MUST rides the kernel's coverage machinery
            # like min_match.
            wand = False
        elif wand is None:
            wand = sum_df >= self.cfg.wand_min_postings
        if not idf_map:
            scored = self._empty_scored()
        elif wand:
            # +n_tombs: tombstoned docs may occupy per-salt top-k slots
            # before the anti-join drops them — widening the ask keeps
            # the post-filter top-k exact (compact to reclaim when the
            # tombstone backlog grows large).
            # MUST_NOT (r3): excluded terms ride the same fan-out — their
            # blocks join the per-salt groups (zero UB, zero score) and
            # the kernel masks their docs before θ, so NOT queries keep
            # block-max pruning instead of forcing the exhaustive path.
            ex = frozenset(exclude)  # OOV excluded terms have no blocks
            fan = sorted(set(idf_map) | ex)
            scored = self._merge_salt_topk(wand_topk(
                self._wand_blocks(fan), idf_map,
                self.stats["avgdl"], (page + 1) * k + self._n_tombs,
                self.stats["k1"], self.stats["b"], min_match,
                excluded=ex or None,
                salt_bits=int(self.stats["salt_bits"]) if ex else None,
                required=frozenset(require) if require else None,
                modifier=modifier,
            ))
        else:
            scored = self._scores_exhaustive(list(idf_map), idf_map,
                                             modifier=modifier)
        if min_match > 1:
            scored = scored.where(F.col("matched") >= min_match)
        if exclude and idf_map and not wand:
            ex_ids = (
                decode_blocks(self._query_blocks(exclude))
                .select("doc_id").distinct()
            )
            scored = scored.join(ex_ids, "doc_id", "left_anti")
        if require and idf_map and not wand:
            # MUST on the exhaustive path: keep docs containing EVERY
            # required term — a bucket+term pruned posting decode
            # (never a content read); an OOV required term yields no
            # posting rows, so no doc reaches the count and the result
            # is empty, like Lucene. (The WAND path already enforced
            # MUST in-kernel: coverage skip + per-doc required count.)
            req_ids = (
                decode_blocks(self._query_blocks(require))
                .groupBy("doc_id")
                .agg(F.countDistinct("term").alias("_nr"))
                .where(F.col("_nr") == len(require))
                .select("doc_id")
            )
            scored = scored.join(req_ids, "doc_id", "left_semi")
        if phrases and idf_map:
            for ph in phrases:
                ids = self._phrase_ids(ph)
                if ids is not None:
                    scored = scored.join(ids, "doc_id", "left_semi")
        with_path = self._live(scored).join(self.docs, "doc_id", "left")
        if field:
            surface = ("path", *self._meta_cols)
            for col, val in sorted(field.items()):
                if col not in surface:
                    raise ValueError(
                        f"field filter column {col!r} not in result "
                        f"surface {list(surface)}"
                    )
                v = val.lower()
                if col == "keywords":
                    # keywords is array<string>: membership, not equality
                    pred = F.array_contains(F.col(col), v)
                elif v.endswith("*"):
                    pred = F.lower(F.col(col)).startswith(v[:-1])
                else:
                    pred = F.lower(F.col(col)) == v
                with_path = with_path.where(pred)
        if after is not None:
            c_s, c_m, c_p, c_d = after
            s, m, p = F.col("score"), F.col("matched"), F.col("path")
            # NULL-safe tail (ADVICE r02): a docs-join miss leaves path
            # NULL, which sorts LAST under the frozen `path desc`
            # (nulls-last) order — i.e. NULL is strictly-after every
            # string in the traversal. A plain `p < c_p` evaluates to
            # NULL there and silently drops rows that OFFSET paging
            # serves at the tail, making them unreachable by cursor.
            if c_p is None:
                # cursor row itself had a NULL path: at equal
                # (score, matched) only NULL-path rows can follow
                path_tail = p.isNull() & (F.col("doc_id") > c_d)
            else:
                path_tail = (
                    (p < c_p)
                    | p.isNull()
                    | ((p == c_p) & (F.col("doc_id") > c_d))
                )
            with_path = with_path.where(
                (s < c_s)
                | ((s == c_s) & (m < c_m))
                | ((s == c_s) & (m == c_m) & path_tail)
            )
        if collapse is not None:
            if collapse not in with_path.columns:
                raise ValueError(
                    f"collapse column {collapse!r} not in result surface "
                    f"{with_path.columns}"
                )
            payload = with_path.columns
            # per-group best under the frozen rank order (§8.4), as a
            # max-struct aggregate: (score, matched, path, -doc_id) —
            # NULL path loses (struct comparison: null smallest), which
            # matches `path desc` nulls-last; groupBy keeps NULL group
            # values as one group, like ES collapse on a missing field
            with_path = (
                with_path.groupBy(F.col(collapse).alias("_grp"))
                .agg(
                    F.max(
                        F.struct(
                            F.col("score"), F.col("matched"), F.col("path"),
                            (-F.col("doc_id")).alias("_neg"),
                            *[F.col(c).alias(f"p_{c}") for c in payload],
                        )
                    ).alias("_b")
                )
                .select(*[F.col(f"_b.p_{c}").alias(c) for c in payload])
            )
        return self._offset_page(
            with_path, rank_order(with_path), page, k
        ).select("doc_id", "score", "matched", "path", *self._meta_cols)

    def bm25_syn(self, groups: list[list[str]], k: int = 10,
                 page: int = 0) -> DataFrame:
        """Synonym-blended BM25 top-k over the compressed index (Lucene
        SynonymQuery): each variant group scores as one pseudo-term —
        per-doc tf = Σ variant tf, df = exact union-df (docs matching
        ANY variant), computed from the already-decoded candidate
        postings in the same job, so the blend costs one extra tiny
        aggregate over candidate rows (≤ Σ df), not a second scan.
        Lucene approximates this df as max(docFreq) because union-df is
        expensive per-segment; distributed, the exact count is free.

        Union-df counts tombstoned docs until compaction, matching the
        engine's frozen-df idf convention for plain terms."""
        groups = [self._alist(g) for g in groups]  # analyzer symmetry
        variants = sorted({t for g in groups for t in g})
        gmap = inline_table(
            self.spark,
            [(t, gi) for gi, g in enumerate(groups) for t in sorted(set(g))],
            "term string, gid int",
        )
        decoded = decode_blocks(self._query_blocks(variants))
        gtf = (
            decoded.join(F.broadcast(gmap), "term")
            .groupBy("doc_id", "gid")
            .agg(F.sum("tf").cast("long").alias("tf"),
                 F.max("dl").alias("dl"))
        )
        gdf = gtf.groupBy("gid").agg(F.count("*").cast("long").alias("df"))
        n = float(self.stats["n_docs"])
        k1, b = self.stats["k1"], self.stats["b"]
        avgdl = self.stats["avgdl"]
        idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
        scored = (
            gtf.join(F.broadcast(gdf), "gid")
            .withColumn("partial", idf * (F.col("tf") * (k1 + 1.0)) / denom)
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("score"),
                 F.count("*").cast("int").alias("matched"))
        )
        with_path = self._live(scored).join(self.docs, "doc_id", "left")
        return self._offset_page(
            with_path, rank_order(with_path), page, k
        ).select("doc_id", "score", "matched", "path", *self._meta_cols)

    def explain(self, query: str, k: int = 10) -> DataFrame:
        """Per-term score breakdown for the top-k hits (Lucene
        ``explain()``): one row per (hit, matched term) with the raw
        statistics (tf, dl, df) and derived factors (idf, saturated tf,
        partial) whose sum reconstructs the hit's BM25 score.

        Cost: the query terms' blocks are decoded once (same pruned
        scan as scoring) and joined to the broadcast k-row top-k —
        k·|q| output rows, content never read."""
        terms = self._qterms(query)
        idf_map, _ = self._term_info(terms)
        if not idf_map:
            return self.spark.createDataFrame(
                [],
                "doc_id long, term string, tf int, dl long, df long, "
                "idf double, tfn double, partial double, score double",
            )
        top = self.bm25(query, k=k).select("doc_id", "score")
        df_rows = self.terms.where(
            F.col("term").isin(list(idf_map))
        ).select("term", "df", "idf")
        decoded = decode_blocks(self._query_blocks(list(idf_map)))
        k1, b = self.stats["k1"], self.stats["b"]
        avgdl = float(self.stats["avgdl"])
        denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        tfn = (F.col("tf") * (k1 + 1.0)) / denom
        return (
            decoded.join(F.broadcast(top), "doc_id")
            .join(F.broadcast(df_rows), "term")
            .select(
                "doc_id", "term",
                F.col("tf").cast("int").alias("tf"),
                F.col("dl").cast("long").alias("dl"),
                F.col("df").cast("long").alias("df"),
                "idf",
                tfn.alias("tfn"),
                (F.col("idf") * tfn).alias("partial"),
                "score",
            )
        )

    def _phrase_ids(self, phrase: str) -> DataFrame | None:
        """doc_ids containing the exact in-order token sequence of
        ``phrase`` (the quoted-phrase FILTER leg of ``bm25``): a
        term-pruned positions scan → shared leg-offset groupBy —
        occurrence-count-free, just existence. Returns None for a
        phrase that tokenizes empty (no-op filter); raises without the
        positional sidecar."""
        from search_engine_spark.ops.phrase import occurrences_from_positions

        pterms = self._qtokens(phrase)
        if not pterms:
            return None
        try:
            positions = self.spark.read.parquet(f"{self.index_dir}/positions")
        except Exception as e:  # noqa: BLE001 - missing sidecar
            raise ValueError(
                "quoted-phrase filters need the positional sidecar — "
                "build with EngineConfig(store_positions=True) "
                "(cli: build --positions)"
            ) from e
        pp = positions.where(
            F.col("term").isin(sorted(set(pterms)))
        ).select("doc_id", "term", F.explode("positions").alias("pos"))
        return (
            occurrences_from_positions(pp, pterms)
            .select("doc_id")
            .distinct()
        )

    def matching_ids(self, query: str, min_match: int = 1) -> DataFrame:
        """All LIVE doc_ids matching ≥ ``min_match`` query terms — the
        ES ``delete_by_query`` / ``_count`` candidate surface: no
        scoring, no top-k, just one bucket+term pruned posting decode →
        doc_id-keyed distinct-term count → tombstone anti-join. Feed
        the result to ``plans.build.delete_docs`` (it accepts a
        DataFrame) for Lucene-model delete-by-query; CLI:
        ``delete <ix> --query="..." [--min-match=N]``."""
        terms = self._qterms(query)
        if not terms:
            return self.spark.createDataFrame([], "doc_id long")
        ids = (
            decode_blocks(self._query_blocks(terms))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("_m"))
            .where(F.col("_m") >= min_match)
            .select("doc_id")
        )
        return self._live(ids)

    def _termvecs(self) -> DataFrame:
        """Lazy term-vectors sidecar (requires an index built with
        ``EngineConfig(store_termvecs=True)``)."""
        try:
            return self.spark.read.parquet(f"{self.index_dir}/termvecs")
        except Exception as e:  # AnalysisException: path missing
            raise RuntimeError(
                "more_like_this/bm25_prf need the term-vectors sidecar: "
                "rebuild with EngineConfig(store_termvecs=True) "
                "(cli: build --termvecs)"
            ) from e

    def more_like_this(self, doc_id: int, k: int = 10,
                       n_seed: int = 5) -> DataFrame:
        """Lucene MoreLikeThis on the persisted index: the seed doc's
        top-``n_seed`` terms by tf·idf (from the term-vectors sidecar —
        a doc_id-pruned scan of ≤ top_m rows, never a content read)
        become a disjunctive BM25 query; the seed itself is excluded.
        Driver syncs are bounded: one ≤ top_m-row collect + the
        ordinary term-dim lookup ``bm25`` does anyway."""
        tv = (
            self._termvecs()
            .where(F.col("doc_id") == doc_id)
            .select("term", "tf")
            .collect()
        )
        if not tv:
            raise ValueError(f"doc {doc_id} not in the term-vectors sidecar")
        idf = self._idf_map([r["term"] for r in tv])
        seeds = sorted(
            tv,
            key=lambda r: (-r["tf"] * idf.get(r["term"], 0.0), r["term"]),
        )[:n_seed]
        q = " ".join(r["term"] for r in seeds)
        hits = self.bm25(q, k=k + 1)
        return hits.where(F.col("doc_id") != doc_id).limit(k)

    def bm25_prf(self, query: str, k: int = 10, n_fb: int = 5,
                 n_exp: int = 3, alpha: float = 0.5,
                 page: int = 0) -> DataFrame:
        """Pseudo-relevance feedback on the persisted index (the engine
        twin of ``ops/search_sql.prf_expanded_topk``): top-``n_fb``
        hits' term vectors vote expansion terms by the pure-integer
        key (Σtf, df, term); the re-query rides ``boost=`` (expansion
        terms at ``alpha``), so block-max WAND pruning stays exact.

        Driver syncs, all bounded: the n_fb-row feedback collect, a
        ≤ n_fb·top_m-row term-vector collect, and one term-dim df
        lookup — the same sync class as spell/typeahead."""
        orig = self._qterms(query)
        fb = [r["doc_id"] for r in self.bm25(query, k=n_fb).collect()]
        if not fb:
            return self.bm25(query, k=k, page=page)
        tv = (
            self._termvecs()
            .where(F.col("doc_id").isin(fb) & ~F.col("term").isin(orig))
            .select("term", "tf")
            .collect()
        )
        s_tf: dict[str, int] = {}
        for r in tv:
            s_tf[r["term"]] = s_tf.get(r["term"], 0) + r["tf"]
        dfs = {
            r["term"]: r["df"]
            for r in self.terms.where(
                F.col("term").isin(list(s_tf))
            ).collect()
        }
        exp = sorted(s_tf, key=lambda t: (-s_tf[t], dfs.get(t, 0), t))[:n_exp]
        expanded = " ".join(sorted({*orig, *exp}))
        return self.bm25(
            expanded, k=k, page=page, boost={t: alpha for t in exp}
        )

    def bm25_batch(self, queries: dict[str, str], k: int = 10,
                   spell: bool = False) -> DataFrame:
        """Top-k for a BATCH of queries in one job → (query_id, doc_id,
        score, matched, rk, path).

        The offline-retrieval shape (training-data selection, relevance
        eval): all queries' terms are unioned into ONE doubly-pruned
        index scan + decode, the (query_id, term, idf) table is
        broadcast, and per-query top-k is a window row_number — so Q
        queries cost one job instead of Q dispatches, and the scan side
        is the union of their block sets (shared terms decoded once).
        """
        qterms = {qid: self._qterms(qtext) for qid, qtext in queries.items()}
        if spell:
            qterms = {q: self.expand_query_terms(ts) for q, ts in qterms.items()}
        all_terms = sorted({t for ts in qterms.values() for t in ts})
        idf_map = self._idf_map(all_terms)
        pairs = [
            (qid, t, float(idf_map[t]))
            for qid, ts in sorted(qterms.items())
            for t in sorted(set(ts))
            if t in idf_map
        ]
        if not pairs:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, score double, "
                    "matched int, rk int, path string"
            )
        decoded = decode_blocks(self._query_blocks(sorted({t for _, t, _ in pairs})))
        q = inline_table(
            self.spark, pairs, "query_id string, term string, idf double"
        )
        scored = partial_scores(
            decoded.join(F.broadcast(q), "term"),
            self.stats["avgdl"], self.stats["k1"], self.stats["b"],
        ).groupBy("query_id", "doc_id").agg(
            F.sum("partial").alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
        with_path = self._live(scored).join(
            self.docs.select("doc_id", "path"), "doc_id", "left"
        )
        w = Window.partitionBy("query_id").orderBy(*rank_order(with_path))
        return (
            with_path.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= k)
            .select("query_id", "doc_id", "score", "matched", "rk", "path")
        )

    def phrase(self, query: str, k: int = 10) -> DataFrame:
        """Exact-phrase BM25 top-k over the persisted positional index
        (requires an index built with ``store_positions=True``).

        The phrase scores as one virtual term (tf = occurrence count,
        df = docs containing the phrase — Lucene PhraseScorer
        semantics). Plan: term-pruned positions scan (row-group min/max
        on the file-sorted term column) → explode → shared leg-offset
        groupBy (ops/phrase.py::occurrences_from_positions) → per-doc
        count → broadcast stats joins → TakeOrderedAndProject.
        Token ORDER is preserved (``tokenize``, not the deduping
        ``query_terms``)."""
        from search_engine_spark.ops.phrase import occurrences_from_positions

        phrase_terms = self._qtokens(query)
        out_schema = ("doc_id long, pf int, score double, path string"
                      + "".join(f", {c} {self._meta_type(c)}" for c in self._meta_cols))
        if not phrase_terms:
            return self.spark.createDataFrame([], out_schema)
        try:
            positions = self.spark.read.parquet(f"{self.index_dir}/positions")
        except Exception as e:  # noqa: BLE001 - missing sidecar
            raise ValueError(
                "no positional index — build with "
                "EngineConfig(store_positions=True)"
            ) from e
        hit = positions.where(F.col("term").isin(sorted(set(phrase_terms))))
        pp = hit.select(
            "doc_id", "dl", "term", F.explode("positions").alias("pos")
        )
        pf = (
            occurrences_from_positions(pp.select("doc_id", "pos", "term"),
                                       phrase_terms)
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("pf"))
        )
        dl = pp.select("doc_id", "dl").distinct()
        return self._rank_virtual_term(pf, dl, k)

    def rescore(self, query: str, k: int = 10, window_size: int = 30,
                weight: float = 2.0) -> DataFrame:
        """Two-phase ranking over the persisted index (the ES
        ``rescore`` API / Lucene QueryRescorer; SQL-checkable flavor:
        ops/phrase.py::phrase_rescore_topk). Phase 1 retrieves the
        top-``window_size`` docs through the ordinary compressed-index
        BM25 path (WAND-eligible — the cheap pass stays prunable);
        phase 2 reads the positional sidecar pruned to the query terms
        AND the window's doc_ids (broadcast semi-join on ≤window_size
        ids) and re-orders by ``final = bm25 + weight·ln(1 +
        phrase_freq)`` — adjacent in-order occurrences of the query
        outrank scattered-term docs of equal BM25, at O(window)
        positional cost regardless of corpus size. Requires
        ``store_positions=True``."""
        from search_engine_spark.ops.phrase import occurrences_from_positions

        phrase_terms = self._qtokens(query)
        cand = self.bm25(query, k=window_size)
        if not phrase_terms:
            return cand.withColumn("pf", F.lit(0)).withColumn(
                "final", F.col("score")
            ).limit(k).select(
                "doc_id", "score", "pf", "final", "matched", "path",
                *self._meta_cols,
            )
        try:
            positions = self.spark.read.parquet(f"{self.index_dir}/positions")
        except Exception as e:  # noqa: BLE001 - missing sidecar
            raise ValueError(
                "no positional index — build with "
                "EngineConfig(store_positions=True)"
            ) from e
        hit = positions.where(
            F.col("term").isin(sorted(set(phrase_terms)))
        ).join(F.broadcast(cand.select("doc_id")), "doc_id", "left_semi")
        pp = hit.select("doc_id", "term", F.explode("positions").alias("pos"))
        pf = (
            occurrences_from_positions(
                pp.select("doc_id", "pos", "term"), phrase_terms
            )
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("pf"))
        )
        return (
            cand.join(pf, "doc_id", "left")
            .withColumn("pf", F.coalesce(F.col("pf"), F.lit(0)).cast("int"))
            .withColumn(
                "final",
                F.col("score") + weight * F.log(F.lit(1.0) + F.col("pf")),
            )
            .orderBy(F.desc("final"), F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score", "pf", "final", "matched", "path",
                    *self._meta_cols)
        )

    def _rank_virtual_term(self, pf: DataFrame, dl: DataFrame, k: int) -> DataFrame:
        """Score a (doc_id, pf) virtual-term relation with BM25 (df =
        matching docs) and rank — shared by ``phrase`` and ``near``."""
        n = float(self.stats["n_docs"])
        avgdl = float(self.stats["avgdl"])
        k1, b = self.stats["k1"], self.stats["b"]
        dfp = pf.agg(F.count("*").cast("long").alias("dfp"))
        m = self._live(pf).join(dl, "doc_id").crossJoin(F.broadcast(dfp))
        idf = F.log((F.lit(n) - F.col("dfp") + 0.5) / (F.col("dfp") + 0.5) + 1.0)
        tfn = (F.col("pf") * (k1 + 1)) / (
            F.col("pf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
        )
        return (
            m.select("doc_id", "pf", (idf * tfn).alias("score"))
            .join(self.docs, "doc_id", "left")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "pf", "score", "path", *self._meta_cols)
        )

    def near(self, a: str, b: str, window: int = 4, k: int = 10,
             ordered: bool = False) -> DataFrame:
        """Proximity search NEAR(a, b, window) over the persisted
        positional index (requires ``store_positions=True``):
        tf = in-window pair count via the same banded range join as the
        SQL-checkable flavor (ops/phrase.py::pair_counts_from_positions),
        scored as one virtual term like ``phrase``. ``ordered`` keeps
        only a-before-b pairs (Lucene SpanNearQuery inOrder)."""
        from search_engine_spark.ops.phrase import pair_counts_from_positions

        a, b = a.lower(), b.lower()
        if self._analyzer != "plain":
            # analyzer symmetry: the positions sidecar stores stemmed
            # terms, so NEAR legs must stem like every other surface
            a, b = self._analyze(a), self._analyze(b)
        out_schema = ("doc_id long, pf int, score double, path string"
                      + "".join(f", {c} {self._meta_type(c)}" for c in self._meta_cols))
        if a == b or not a or not b:
            raise ValueError("near() requires two distinct non-empty terms")
        try:
            positions = self.spark.read.parquet(f"{self.index_dir}/positions")
        except Exception as e:  # noqa: BLE001 - missing sidecar
            raise ValueError(
                "no positional index — build with "
                "EngineConfig(store_positions=True)"
            ) from e
        hit = positions.where(F.col("term").isin([a, b]))
        pp = hit.select(
            "doc_id", "dl", "term", F.explode("positions").alias("pos")
        )
        pf = pair_counts_from_positions(
            pp.select("doc_id", "pos", "term"), a, b, window, ordered
        )
        dl = pp.select("doc_id", "dl").distinct()
        return self._rank_virtual_term(pf, dl, k)

    def substring(self, needle: str, corpus_path: str, k: int = 10) -> DataFrame:
        """Substring search across token boundaries over the persisted
        trigram sidecar (requires ``EngineConfig(store_trigrams=True)``)
        → (doc_id, n_occ, path, …meta) ordered by occurrence count.

        The index wipes content (S13), so the exact-``contains`` verify
        reads it back from the corpus — but ONLY for the candidates
        that survive the trigram AND (point lookups, not a scan; the
        same shape as Zoekt verifying against its stored file blobs).
        ``load_corpus`` re-derives the same deterministic doc_id, so
        the verify join is a natural-key join."""
        from search_engine_spark.ops.trigram import _trigrams
        from search_engine_spark.sources.corpus import load_corpus, with_identity

        needle = needle.lower()
        out_schema = ("doc_id long, n_occ int, path string"
                      + "".join(f", {c} {self._meta_type(c)}" for c in self._meta_cols))
        tris = _trigrams(needle)
        if not tris:
            return self.spark.createDataFrame([], out_schema)
        try:
            tp = self.spark.read.parquet(f"{self.index_dir}/trigrams")
        except Exception as e:  # noqa: BLE001 - missing sidecar
            raise ValueError(
                "no trigram index — build with "
                "EngineConfig(store_trigrams=True)"
            ) from e
        cand = (
            tp.where(F.col("tri").isin(tris))
            .groupBy("doc_id")
            .agg(F.count("*").alias("ntri"))
            .where(F.col("ntri") == len(tris))
            .select("doc_id")
        )
        content = with_identity(load_corpus(self.spark, corpus_path)).select(
            "doc_id", F.lower(F.col("content")).alias("lt")
        )
        n_occ = (
            (F.length("lt") - F.length(F.replace(F.col("lt"), F.lit(needle),
                                                 F.lit(""))))
            / len(needle)
        ).cast("int")
        from search_engine_spark.functions.barrier import verify_after_join

        verified = (
            content.join(cand, "doc_id", "left_semi")
            # barrier: contains() stays ABOVE the semi-join → verify
            # touches candidate content only (functions/barrier.py)
            .where(verify_after_join(F.col("lt").contains(needle)))
            .select("doc_id", n_occ.alias("n_occ"))
        )
        return (
            self._live(verified)
            .join(self.docs, "doc_id", "left")
            .orderBy(F.desc("n_occ"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "n_occ", "path", *self._meta_cols)
        )

    def regex(self, pattern: str, corpus_path: str, k: int = 10) -> DataFrame:
        """Regex search over the persisted trigram sidecar →
        (doc_id, n_match, path, …meta) ordered by match count.

        Cox's planner (`ops/regexsearch.plan_trigram_query`) compiles
        the pattern into a CNF trigram query; the sidecar scan prunes
        to the query's trigrams, and the regex engine runs only on CNF
        survivors (content point-lookups from the corpus, same shape
        as ``substring``). A pattern with no usable literals degrades
        to a full verify scan — documented, Cox's ALL query."""
        import re as _re

        from search_engine_spark.ops.regexsearch import plan_trigram_query
        from search_engine_spark.sources.corpus import load_corpus, with_identity

        _re.compile(pattern)
        cnf = plan_trigram_query(pattern)
        content = with_identity(load_corpus(self.spark, corpus_path)).select(
            "doc_id", F.lower(F.col("content")).alias("lt")
        )
        if cnf is not None:
            try:
                tp = self.spark.read.parquet(f"{self.index_dir}/trigrams")
            except Exception as e:  # noqa: BLE001 - missing sidecar
                raise ValueError(
                    "no trigram index — build with "
                    "EngineConfig(store_trigrams=True)"
                ) from e
            all_tris = sorted({t for clause in cnf for t in clause})
            from search_engine_spark.functions.inline import inline_table

            rows = [(t, i) for i, clause in enumerate(cnf) for t in clause]
            q = inline_table(self.spark, rows, "tri string, clause_id int")
            cand = (
                tp.where(F.col("tri").isin(all_tris))
                .join(F.broadcast(q), "tri")
                .select("doc_id", "clause_id")
                .distinct()
                .groupBy("doc_id")
                .agg(F.count("*").alias("nc"))
                .where(F.col("nc") == len(cnf))
                .select("doc_id")
            )
            content = content.join(cand, "doc_id", "left_semi")
        n_match = F.regexp_count(F.col("lt"), F.lit(pattern)).cast("int")
        from search_engine_spark.functions.barrier import verify_after_join

        # barrier: regex verify stays ABOVE the semi-join → evaluated
        # on CNF survivors only (functions/barrier.py); harmless in the
        # cnf-is-None full-scan branch
        verified = content.select("doc_id", n_match.alias("n_match")).where(
            verify_after_join(F.col("n_match") > 0)
        )
        return (
            self._live(verified)
            .join(self.docs, "doc_id", "left")
            .orderBy(F.desc("n_match"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "n_match", "path", *self._meta_cols)
        )

    def total_hits(self, query: str) -> int:
        """Total distinct matching docs — the reference's
        ``GetTotalPages`` (`services/engine/internal/store/store.go:
        172-186`, SURVEY §2.4 A5). Decodes only matching blocks; for
        display-only counts at huge scale swap countDistinct for
        approx_count_distinct (same plan shape)."""
        terms = self._qterms(query)
        idf_map = self._idf_map(terms)
        if not idf_map:
            return 0
        decoded = decode_blocks(self._query_blocks(list(idf_map)))
        return (
            self._live(decoded.select("doc_id"))
            .select(F.countDistinct("doc_id"))
            .collect()[0][0]
        )

    def facets(self, query: str,
               facet_cols: tuple[str, ...] = ("lang", "repo")) -> DataFrame:
        """Facet counts over the FULL matching set of the compressed
        index: per (dimension, value) — matching-doc count, max and
        total BM25 score (the engine twin of
        ``ops/search_sql.search_facets``; Lucene facets / ES terms-agg
        shape). Plan: doubly-pruned block scan → exhaustive score (the
        full matching set is needed, so WAND pruning can't apply — same
        reason the reference's candidate page is exhaustive) → one
        shuffle join to the docs dims → stack-unpivot → single pass of
        low-cardinality groupBys (combiner-friendly: shuffle rows =
        #values per mapper)."""
        terms = self._qterms(query)
        idf_map = self._idf_map(terms)
        out_schema = ("facet string, value string, n_docs long, "
                      "max_score double, sum_score double")
        if not idf_map:
            return self.spark.createDataFrame([], out_schema)
        scored = self._live(self._scores_exhaustive(list(idf_map), idf_map))
        dims = self.spark.read.parquet(f"{self.index_dir}/docs").select(
            "doc_id", *facet_cols
        )
        stack_args = ", ".join(f"'{c}', {c}" for c in facet_cols)
        stacked = scored.join(dims, "doc_id").selectExpr(
            "score", f"stack({len(facet_cols)}, {stack_args}) AS (facet, value)"
        )
        return stacked.groupBy("facet", "value").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.max("score"), 4).alias("max_score"),
            F.round(F.sum("score"), 4).alias("sum_score"),
        )

    # ---- reference-compat: blended final ranking (§8.4) ----
    def search(self, query: str, k: int = 10, spell: bool = False,
               page_num: int = 0, mode: str = "bm25") -> DataFrame:
        """``mode="bm25"`` (frozen-spec primary) or ``mode="cosine"``
        (reference-compat TF-IDF-cosine per tf-idf.go:24-86 /
        ranking.go:23-38, flag-gated as SURVEY §8.2 promises): only the
        relevance score feeding the min-max + 0.5-blend changes.
        Trailing-``*`` tokens expand like :meth:`bm25`."""
        if "*" in query:
            query, expansions = self.expand_prefix_terms(query)
            terms = sorted({*self._qterms(query), *expansions})
        else:
            terms = self._qterms(query)
        if spell:
            terms = self.expand_query_terms(terms)
        idf_map = self._idf_map(terms)
        if not idf_map:
            return self.spark.createDataFrame(
                [],
                "doc_id long, global_score double, score double, matched int, "
                "path string, prior double"
                + "".join(f", {c} {self._meta_type(c)}" for c in self._meta_cols),
            )
        if mode == "cosine":
            scored = self._cosine_scores(list(idf_map), self._idf_ref_map(terms))
        else:
            scored = self._scores_exhaustive(list(idf_map), idf_map)
        cand = self._live(scored).join(
            self.prior, "doc_id", "left"
        ).na.fill({"prior": 0.0})
        # pagination happens at the candidate window, like the
        # reference's LIMIT $2 OFFSET $3 in the ranked CTE (store.go:88-98)
        page = self._offset_page(
            cand,
            [F.desc("matched"), F.desc("prior"), F.asc("doc_id")],
            page_num,
            self.cfg.candidate_k,
        )
        # min-max normalize within the page via an unpartitioned window
        # over the ≤(page+1)·candidate_k surviving rows — one pass, no
        # driver collect, nothing left cached per query call
        wmm = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
        smin, smax = F.min("score").over(wmm), F.max("score").over(wmm)
        norm = F.when(
            smax - smin > 0, (F.col("score") - smin) / (smax - smin)
        ).otherwise(F.lit(0.0))
        w = self.cfg.blend_weight
        out = (
            page.withColumn("norm", norm)
            .withColumn(
                "global_score", F.lit(w) * F.col("norm") + F.lit(1.0 - w) * F.col("prior")
            )
            .join(self.docs, "doc_id", "left")
            .orderBy(
                F.desc("global_score"), F.desc("matched"), F.desc("path"), F.asc("doc_id")
            )
            .select("doc_id", "global_score", "score", "matched", "path", "prior",
                    *self._meta_cols)
            .limit(k)
        )
        return out
