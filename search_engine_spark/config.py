"""Engine-wide constants and configuration.

Frozen behavioral constants come from SURVEY.md §8 (which cites the
reference implementation):

- tokenizer trim set / length cap: reference
  `services/indexer/src/core/text_sink.rs:43-66` and the VARCHAR(25)
  dictionary cap `migration/schema.sql:21`.
- BM25 k1/b: SURVEY.md §8.2 (Lucene-positive IDF variant).
- PageRank d/tol/iters: reference `services/ranking/src/page_rank.py:36-38`.
- top-k page size 20: reference
  `services/engine/internal/config/store/store.config.go:11`.
- blend weight 0.5: reference
  `services/engine/internal/service/ranking/ranking.go:30`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- tokenizer (frozen spec §8.1) ---
# leading/trailing trim set: whitespace + . , : / ; " '
TOKEN_TRIM_CHARS = ".,:;/'\" \t\n\r\x0b\x0c"
MAX_TERM_LEN = 25

# --- BM25 (frozen spec §8.2) ---
BM25_K1 = 1.2
BM25_B = 0.75

# --- PageRank (frozen spec §8.3) ---
PAGERANK_DAMPING = 0.85
PAGERANK_TOL = 1e-5
PAGERANK_MAX_ITERS = 100

# --- final ranking (frozen spec §8.4) ---
CANDIDATE_K = 20  # reference PAGE_SIZE
BLEND_WEIGHT_TFIDF = 0.5  # reference ranking.go:30 hardcoded 0.5

# --- streaming ---
# Lone-tail idle TTL for streaming/transitions.py (EVENT-TIME ms): a
# user's unpaired last event is evicted once the watermark passes
# tail_ts + TTL, bounding aggregate state by ACTIVE users rather than
# ever-seen users. The trade-off is explicit: a successor arriving more
# than the TTL after its predecessor starts a fresh chain, so that one
# pair is dropped relative to the batch op (evictions are logged so the
# drop is observable). 30 days of event time by default.
TRANSITIONS_IDLE_TTL_MS = 30 * 24 * 3600 * 1000

# --- index layout ---
BLOCK_SIZE = 128  # postings per compressed block
DEFAULT_TERM_BUCKETS = 64  # directory partitions of the index table
DEFAULT_SALT_BITS = 4  # doc_id-range salt: 2^bits sub-partitions per term


@dataclass
class EngineConfig:
    """Tunable knobs for a build/query run.

    ``salt_bits`` implements the salted repartition-by-term: the salt is
    the top ``salt_bits`` bits of the (uniform-hash) doc_id, so each
    (term, salt) group covers a contiguous doc_id range. Hot terms are
    thereby split across 2^salt_bits reducers while keeping blocks
    globally doc_id-sorted by (salt, doc_id) — which block-max WAND
    relies on. Scale note: at 10^12 docs raise salt_bits (e.g. 8-10) and
    term_buckets (e.g. 4096); both are pure layout knobs.
    """

    block_size: int = BLOCK_SIZE
    term_buckets: int = DEFAULT_TERM_BUCKETS
    salt_bits: int = DEFAULT_SALT_BITS
    k1: float = BM25_K1
    b: float = BM25_B
    candidate_k: int = CANDIDATE_K
    blend_weight: float = BLEND_WEIGHT_TFIDF
    build_waves: int = 4  # stage-1 checkpoint granularity (jobs per build)
    build_partitions: int = 16  # per-partition lineage granularity
    # tokenizer: "pandas" (mandated vectorized Arrow/pandas UDF path) or
    # "jvm" (identical rules as whole-stage-codegen expressions; no
    # Python workers — see functions/tokenize.py::extract_postings_jvm)
    tokenizer: str = "pandas"
    # opt-in analyzer stage (Lucene EnglishMinimalStemFilter): s-stem
    # every indexed token AND every query term, so plural/singular
    # variants share one posting list (tf sums, df unions). Applied
    # inside the tokenize kernels — zero extra passes — and recorded in
    # stats.json as ``analyzer``; extend/compact inherit the index's
    # analyzer (an index property, not a per-run choice). Default off:
    # the frozen-spec tokenizer (§8.1) is the reference contract.
    # Values: False (plain), True/"stem" (s-stemmer), "porter" (the
    # full Porter 1980 algorithm, functions/porter.py — r4).
    stem: bool | str = False
    # posting-run codec: "vbyte", "packed" (word-aligned fixed-width,
    # k=64//w values per uint64 word), or "auto" (per-run analytic pick
    # of whichever is smaller — framed with a 1-byte header so mixed
    # codecs coexist per block with no schema or segment flag; see
    # functions/vbyte.py). Zipf tf/dl runs pack to 1-3 bits; wide
    # doc-gap runs fall back to VByte.
    codec: str = "auto"
    # cost-based bm25 routing (wand=None): force the exhaustive path
    # when the query's candidate posting volume (Σ df over query terms,
    # already driver-known from the idf lookup) is below this — decoding
    # everything in one narrow vectorized pass beats the WAND fan-out's
    # extra exchange + per-salt Python groups until decode cost
    # dominates. Two-point measurement (tools/bench_wand.py, rank-
    # identical both ways): 120k docs / Σdf≈0.4M → exhaustive wins
    # (WAND 0.82× as fast); 1M docs / Σdf≈3.5M → WAND wins (1.24× p50,
    # up to 2.5×). Crossover sits right at this default; at 100 TB any
    # real query is far past it and routes to WAND.
    wand_min_postings: int = 1_000_000
    # cap on concurrent Python-worker tasks for grouped pandas stages
    # (block encode). On hosts where kernel memcg accounting throttles
    # many concurrent page-faulting workers (this sandbox), a small cap
    # is faster than one worker per core; on healthy clusters set to
    # executor cores. None → leave stage parallelism to Spark.
    python_parallelism: int | None = 8
    # block-encode kernel: "batch" (default — hash exchange on
    # (term, salt) + sortWithinPartitions + mapInPandas streaming a
    # vectorized many-groups encoder, ONE VByte call per Arrow batch) or
    # "grouped" (round-1 layout: groupBy.applyInPandas, one Python call
    # per (term, salt) group — kept as the spec twin; the batch kernel
    # is property-tested byte-identical against it). The batch kernel
    # removes the per-group pandas overhead that made encode the worst-
    # scaling build stage (0.66 N→4N vs 0.85 for postings).
    encode_kernel: str = "batch"
    # df-adaptive salting (SURVEY §7 watch item 2, two-pass df → salt):
    # a term with df < threshold packs its whole posting list into ONE
    # unsalted group (salt = -1) instead of fanning out across
    # 2^salt_bits mostly-singleton blocks; the query side replicates
    # the (few, small) unsalted blocks into every salt group and
    # max-merges, which keeps block-max WAND exact (partial scores only
    # underestimate). With Zipf vocab (code identifiers!) the long tail
    # dominates the dictionary, so this collapses block-row count while
    # leaving hot-term skew handling untouched. None → block_size;
    # 0 → disabled (round-1 layout).
    rare_salt_df_threshold: int | None = None
    # opt-in positional index (Lucene-style positions sidecar): stage 1
    # additionally writes (doc_id, term, positions, dl) per wave, and
    # QueryEngine.phrase() answers exact-phrase BM25 top-k from it.
    # Off by default — positions roughly double stage-1 output bytes.
    store_positions: bool = False
    # opt-in character-trigram sidecar (Google-Code-Search/Zoekt layout):
    # QueryEngine.substring() answers cross-token substring queries from
    # it (candidate = trigram AND, verify = contains on survivors).
    store_trigrams: bool = False
    # opt-in term-vectors sidecar (Lucene term vectors): per-doc top-m
    # (term, tf) rows derived from the wave's already-written postings
    # (no second tokenize), doc_id-pruned at read. Powers engine-side
    # more_like_this() and bm25_prf() on the persisted index.
    store_termvecs: bool = False
    termvec_top_m: int = 20
    # opt-in reversed-dictionary sidecar (Lucene ReverseStringFilter
    # field): terms re-sorted by reverse(term) so a suffix wildcard
    # (*er) becomes a contiguous RANGE scan on the reversed key instead
    # of a full dictionary scan. Vocabulary-sized (Heaps-sublinear), so
    # the write is cheap; refreshed alongside the terms table on every
    # build/extend/compact once present. QueryEngine.expand_prefix_terms
    # prefers it automatically when the sidecar exists.
    store_suffixes: bool = False
    # lone-tail idle TTL for the streaming transitions op (see the
    # TRANSITIONS_IDLE_TTL_MS module constant for the semantics and the
    # stream-vs-batch finality trade-off it encodes)
    transitions_idle_ttl_ms: int = TRANSITIONS_IDLE_TTL_MS
    # link-prior refresh policy for extends: "always" reruns the full
    # edge-resolve + PageRank after every delta (exact, but the graph
    # pass is O(corpus) — per-micro-batch it dominates streaming ingest
    # at scale); "defer" skips it, leaving the landed prior stale-but-
    # valid: queries left-join the prior and floor missing docs at 0.0,
    # so new docs simply carry no link signal until the next
    # plans.build.refresh_prior() / compact_index(). Base builds always
    # compute the prior regardless (a query engine needs the table).
    prior_refresh: str = "always"
    # tiered-merge thresholds for plans.build.maybe_compact (the Lucene
    # MergePolicy analogue): compact when live segment count exceeds
    # max_generations, or the tombstoned fraction of the corpus exceeds
    # max_tombstone_frac. Layout-only knobs — at 10^12-file scale raise
    # max_generations to trade merge amplification for scan fan-out.
    compact_max_generations: int = 8
    compact_max_tombstone_frac: float = 0.2
    pagerank_damping: float = PAGERANK_DAMPING
    pagerank_tol: float = PAGERANK_TOL
    pagerank_max_iters: int = PAGERANK_MAX_ITERS
    # OPT-IN: warm-start incremental prior refreshes from the previous
    # prior table. After a small extend/delete the old ranks are already
    # near the new fixpoint, so iterations-to-tol collapse (pagerank()
    # reseeds new ids at 1/n, drops deleted ids, renormalizes — power
    # iteration converges from any normalized start). Default OFF
    # because the warm trajectory stops at a DIFFERENT approximation of
    # the same fixpoint (each run is within tol/(1-d) L1 of it, so warm
    # vs cold differ by ≤ 2·tol/(1-d) ≈ 1.3e-4): with it on, extend is
    # equivalent to a fresh build only within that bound, not bit-equal
    # — the right trade at 10^12-file scale (the 100-iteration cold
    # graph pass is the dominant extend cost), kept off here so the
    # exact-equivalence gates stay the default contract.
    pagerank_warm_start: bool = False
    extra: dict = field(default_factory=dict)
