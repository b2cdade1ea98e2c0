"""Deterministic synthetic web-page corpus (the F0 fixture) + query set.

Schema matches the authoritative ``input_hint`` exactly:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

The HTML wraps the text so that :func:`search_ingest_ray.stages.extract
.extract_text` recovers it **byte-identically** (the per-row invariant vs the
reference).  Generation is seeded and pure — no wall clock, no external data.

The token stream is Zipfian over a mixed-language vocabulary including
non-ASCII words (é, ü, ß, ñ ...) to exercise ascii-folding with
preserve_original (/root/reference/src/search-ingest/schemas.cr:61-77).
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- vocabulary -------------------------------------------------------------

_BASE_WORDS = [
    "data", "search", "index", "query", "term", "score", "rank", "page", "web",
    "crawl", "text", "token", "batch", "stream", "shard", "merge", "sort",
    "hash", "join", "group", "filter", "scan", "block", "delta", "code",
    "store", "cache", "node", "actor", "task", "graph", "plan", "cost",
    "read", "write", "open", "close", "time", "date", "user", "name", "link",
    "site", "host", "path", "file", "byte", "word", "line", "list", "tree",
    "heap", "stack", "queue", "ring", "pool", "lock", "sync", "async", "wait",
    "retry", "error", "fault", "crash", "resume", "epoch", "state", "log",
    "event", "value", "key", "field", "type", "schema", "table", "row",
    "column", "vector", "matrix", "tensor", "model", "train", "learn", "deep",
    "neural", "layer", "weight", "bias", "grad", "loss", "metric", "bench",
]
_LANG_WORDS = {
    "en": ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
           "naive", "cafe", "resume"],
    "de": ["straße", "müller", "können", "über", "schön", "größe", "bär",
           "weiß", "grün", "fünf"],
    "fr": ["café", "élève", "être", "déjà", "façon", "naïve", "résumé",
           "forêt", "noël", "cœur"],
    "es": ["niño", "señor", "mañana", "así", "después", "corazón", "años",
           "música", "rápido", "número"],
}
LANGS = ["en", "de", "fr", "es"]
_LANG_P = [0.55, 0.17, 0.15, 0.13]

# Long-tail derived vocabulary: web text has a Zipfian term space far larger
# than any word list; these synthetic forms give the index a realistic
# distinct-term count (term-shuffle width, segment sizes, df spread).
VOCAB_EXTRA = 20_000
_EXTRA_WORDS = [f"w{i:x}" for i in range(VOCAB_EXTRA)]


def vocabulary(lang: str) -> list[str]:
    return _BASE_WORDS + _LANG_WORDS[lang] + _EXTRA_WORDS


# --- HTML wrapping / extraction contract ------------------------------------

_PRE = ('<html><head><meta charset="utf-8"><title>synthetic</title></head>'
        "<body><nav>boilerplate nav</nav><article>")
_POST = "</article><footer>boilerplate footer</footer></body></html>"


def wrap_html(text: str) -> bytes:
    """Embed ``text`` in an HTML page; ``extract_text(wrap_html(t)) == t``."""
    return (_PRE + _html.escape(text) + _POST).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Pure extractor (operator E1): byte-identical inverse of wrap_html.

    The extractor contract is versioned by EXTRACTOR_VERSION; its value goes
    into the index manifest so a changed extractor forces a rebuild
    (consistency-check analog, /root/reference/src/search-ingest/table.cr:190-204).
    """
    s = html_bytes.decode("utf-8")
    start = s.index("<article>") + len("<article>")
    end = s.rindex("</article>")
    return _html.unescape(s[start:end])


EXTRACTOR_VERSION = "extract-article-v1"


# --- corpus generation ------------------------------------------------------

def generate_pages(num_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Generate ``num_docs`` synthetic pages with global doc indices
    ``start .. start+num_docs`` (so multi-file corpora are deterministic
    regardless of file count)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, start]))
    langs = rng.choice(len(LANGS), size=num_docs, p=_LANG_P)
    # doc lengths: lognormal, median ~120 tokens
    lens = np.clip(rng.lognormal(mean=4.8, sigma=0.6, size=num_docs), 10, 2000).astype(np.int64)

    urls = [f"https://host{(start + i) % 97}.example.com/p/{start + i:012d}"
            for i in range(num_docs)]
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base_ts + (np.int64(start) + np.arange(num_docs)) * np.timedelta64(1000, "us")

    texts: list[str] = []
    vocabs = {i: np.array(vocabulary(LANGS[i])) for i in range(len(LANGS))}
    for i in range(num_docs):
        v = vocabs[langs[i]]
        # Zipf-ish: rank = floor(u^2 * V) concentrates mass on low ranks
        u = rng.random(lens[i])
        idx = np.minimum((u * u * len(v)).astype(np.int64), len(v) - 1)
        texts.append(" ".join(v[idx]))

    htmls = [wrap_html(t) for t in texts]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[i] for i in langs], pa.string()),
    })


def write_corpus(out_dir: str, num_docs: int, num_files: int = 8, seed: int = 42) -> list[str]:
    """Write a deterministic corpus as ``num_files`` Parquet files.

    Returns the file paths (sorted).  Idempotent: existing complete corpora
    are left untouched (a marker file records the parameters).
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_COMPLETE")
    stamp = f"{num_docs}:{num_files}:{seed}:v2"
    if os.path.exists(marker) and open(marker).read() == stamp:
        return sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                      if f.endswith(".parquet"))
    per = num_docs // num_files
    paths = []
    for f in range(num_files):
        n = per if f < num_files - 1 else num_docs - per * (num_files - 1)
        t = generate_pages(n, seed=seed, start=f * per)
        p = os.path.join(out_dir, f"pages-{f:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return sorted(paths)


def query_set(seed: int = 42, n: int = 32) -> list[list[str]]:
    """Seeded query set: 1-3 term queries drawn from the corpus vocabulary,
    including folded and unfolded variants of non-ASCII words (the analog of
    the reference's fixed spec assertions)."""
    rng = np.random.default_rng(seed)
    pool = list(_BASE_WORDS)
    for ws in _LANG_WORDS.values():
        pool.extend(ws)
    # folded variants exercise preserve_original matching
    from .analyzer import ascii_fold
    pool.extend(ascii_fold(w) for w in ["café", "straße", "niño", "müller"])
    queries = []
    for _ in range(n):
        k = int(rng.integers(1, 4))
        terms = [pool[int(i)] for i in rng.integers(0, len(pool), size=k)]
        queries.append(terms)
    return queries
