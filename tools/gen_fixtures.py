"""Deterministic fixture corpus generator (FIXTURES.md; seed 42).

Pure Python + pyarrow — no Spark — so the NumPy oracle and the Spark
engine consume byte-identical inputs. Emits, under an output dir:

- ``corpus.parquet``  — (repo, path, commit, lang, content): the exact
  input shape from BASELINE.json input_hint.
- ``expected.json``   — per-row doc_id (xxhash64 parity), sha256(content),
  and the expected edge list (src_doc_id, dst_doc_id) derived from the
  planted ``import <path>`` reference statements.
- ``queries.json``    — the fixed reference query set (FIXTURES.md §2).

Graph shape (FIXTURES.md §3): ~4 out-refs/doc with power-law in-degree;
doc index 0 is dangling (no out-refs, many in-refs); doc index 1 is
source-only (links out, never linked to); every doc appears in ≥1 edge.
"""

from __future__ import annotations

import hashlib
import json
import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from search_engine_spark.functions.xxhash import doc_id_of  # noqa: E402

LANGS = ["python", "go", "rust", "java", "js"]

# tokens that exercise every tokenizer rule (SURVEY §8.1)
NOISE = [
    "123",            # pure integer → dropped
    "99999999999999999999",  # > u32 but still non-alpha → dropped
    "x1y2",           # digit-mixed → dropped
    "foo.bar",        # internal punctuation → dropped
    "(parens)",       # non-trimmed symbol → dropped
    '"Quoted"',       # trim-wrapped, mixed case → kept as 'quoted'
    "';edge:'",       # multi-char trim → kept as 'edge'
    "naïve",          # Unicode-alphabetic → kept
    "übermäßig",      # Unicode-alphabetic → kept
    "a" * 30,         # length > 25 → dropped
    "MixedCaseToken",  # kept lowercased
    "trailing...",    # kept as 'trailing'
    ":::",            # trims to empty → dropped
]


def make_vocab(n: int = 2000) -> list[str]:
    roots = [
        "tree", "node", "hash", "index", "search", "binary", "merge", "sort",
        "query", "token", "parse", "block", "score", "rank", "graph", "edge",
        "cache", "batch", "shard", "split", "scan", "join", "group", "build",
        "fetch", "store", "write", "read", "heap", "stack", "queue", "list",
        "map", "set", "tier", "page", "term", "doc", "link", "crawl",
    ]
    vocab = list(roots)
    i = 0
    while len(vocab) < n:
        a = roots[i % len(roots)]
        b = roots[(i * 7 + 3) % len(roots)]
        vocab.append(f"{a}{b}" if i % 2 else f"{b}{a}x")
        i += 1
    return vocab[:n]


def zipf_weights(n: int, s: float = 1.1) -> list[float]:
    return [1.0 / ((r + 1) ** s) for r in range(n)]


def gen_corpus(n_docs: int, seed: int = 42):
    rng = random.Random(seed)
    vocab = make_vocab()
    weights = zipf_weights(len(vocab))

    paths = [
        f"src/pkg{i % 17}/mod{i}.{ {'python': 'py', 'go': 'go', 'rust': 'rs', 'java': 'java', 'js': 'js'}[LANGS[i % 5]] }"
        for i in range(n_docs)
    ]

    # --- plan the reference graph first (FIXTURES.md §3) ---
    # power-law target preference: low doc indices get most in-links.
    target_pool = [i for i in range(n_docs) if i != 1]  # doc 1: source-only
    tw = zipf_weights(len(target_pool), s=1.2)
    out_refs: list[list[int]] = [[] for _ in range(n_docs)]
    for i in range(n_docs):
        if i == 0:
            continue  # doc 0: dangling (no out-refs)
        k = rng.randint(2, 6)
        tgts = set()
        while len(tgts) < k:
            t = rng.choices(target_pool, weights=tw, k=1)[0]
            if t != i:
                tgts.add(t)
        out_refs[i] = sorted(tgts)

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    expected = []
    edges = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        commit = hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40]
        lang = LANGS[i % 5]
        n_tok = rng.randint(50, 800)
        toks = rng.choices(vocab, weights=weights, k=n_tok)
        # sprinkle noise tokens (~5%)
        for _ in range(max(1, n_tok // 20)):
            toks.insert(rng.randrange(len(toks)), rng.choice(NOISE))
        body_lines = [" ".join(toks[j : j + 12]) for j in range(0, len(toks), 12)]
        ref_lines = [f"import {paths[t]}" for t in out_refs[i]]
        content = "\n".join(ref_lines + body_lines)
        rows["repo"].append(repo)
        rows["path"].append(paths[i])
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(content)
        did = doc_id_of(repo, paths[i], commit)
        expected.append(
            {
                "i": i,
                "doc_id": did,
                "path": paths[i],
                "sha256": hashlib.sha256(content.encode("utf-8")).hexdigest(),
            }
        )
    by_index = {e["i"]: e["doc_id"] for e in expected}
    for i in range(n_docs):
        for t in out_refs[i]:
            edges.append([by_index[i], by_index[t]])
    return rows, expected, edges, vocab


def gen_queries(vocab: list[str]) -> list[str]:
    hot, rare = vocab[0], vocab[1900]
    return [
        hot,                                # 1-term hot
        rare,                               # 1-term rare
        "zzzunknownzzz",                    # OOV → zero hits
        f"{hot} {hot}",                     # repeated term → dedup
        f"Binary.Search, {vocab[5]}",       # mixed case + punctuation
        f"{vocab[0]} {vocab[1]}",
        f"{vocab[2]} {vocab[3]} {vocab[4]}",
        f"{vocab[10]} {vocab[200]} {vocab[30]} {vocab[400]}",
        f"{vocab[7]} {rare}",
        f"{vocab[1]} {vocab[1500]}",
        f"{vocab[11]} {vocab[12]}",
        f"{vocab[13]} {vocab[14]} {vocab[15]}",
        f"{vocab[16]}, {vocab[17]}.",
        f"'{vocab[18]}' \"{vocab[19]}\"",
        f"{vocab[20]} 123 {vocab[21]}",     # numeric token in query dropped
        f"{vocab[600]} {vocab[700]}",
        f"{vocab[800]}",
        f"{vocab[900]} {vocab[950]} {vocab[999]}",
        f"{vocab[25]} {vocab[26]} {vocab[27]} {vocab[28]}",
        f"{vocab[40] if len(vocab) > 40 else hot} {hot}",
    ]


def write_fixture(out_dir: str | Path, n_docs: int, seed: int = 42) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows, expected, edges, vocab = gen_corpus(n_docs, seed)
    table = pa.table(
        {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
    )
    pq.write_table(table, out / "corpus.parquet")
    (out / "expected.json").write_text(
        json.dumps({"docs": expected, "edges": edges}, indent=0)
    )
    (out / "queries.json").write_text(json.dumps(gen_queries(vocab), indent=0))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/sf-unit"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    p = write_fixture(dest, n)
    print(f"wrote {n}-doc fixture to {p}")
