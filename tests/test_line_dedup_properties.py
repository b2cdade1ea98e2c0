"""Property-based test (hypothesis) for RefinedWeb line dedup: the
partition kernels composed exactly as the Ray pipeline composes them
(explode → group by span-hash partition → mark → group by doc partition →
reassemble) vs a straightforward Python brute force.  Running the kernels
in-process is faithful because a Ray groupby is a pure partition of rows."""

import functools

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_ingest_ray.analyzer import tokenize_simple
from search_ingest_ray.functions.dedup import (_line_mark_partition,
                                               _span_reassemble_partition,
                                               _span_rows_batch)
from search_ingest_ray.stages.fold import _PART_COL, _tag_partition

docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=1, max_size=12,
)


def _brute(rows, k, min_docs):
    spans = {}  # doc -> [span]
    for doc_id, text in rows:
        toks = tokenize_simple(text or "")
        ns = (len(toks) + k - 1) // k
        spans[doc_id] = [" ".join(toks[j * k:(j + 1) * k])
                         for j in range(ns)]
    df = {}
    for doc_id, sps in spans.items():
        for sp in set(sps):
            df[sp] = df.get(sp, 0) + 1
    out = {}
    for doc_id, sps in spans.items():
        kept = [sp for sp in sps if df[sp] < min_docs]
        out[doc_id] = (len(sps), len(kept), " ".join(kept))
    return out


def _run_kernels(rows, k, min_docs, num_partitions=3):
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "text": pa.array([t for _, t in rows], pa.string()),
    })
    exploded = _span_rows_batch(batch, text_col="text", id_col="doc_id",
                                span_tokens=k,
                                num_partitions=num_partitions)
    marked = []
    for p in range(num_partitions):
        g = exploded.filter(pa.compute.equal(exploded[_PART_COL], p))
        marked.append(_line_mark_partition(g, min_docs=min_docs))
    marked = pa.concat_tables(marked)
    tagged = _tag_partition(marked, key_cols=["doc_id"],
                            num_partitions=num_partitions)
    out = {}
    for p in range(num_partitions):
        g = tagged.filter(pa.compute.equal(tagged[_PART_COL], p))
        t = _span_reassemble_partition(g.drop_columns([_PART_COL]))
        for r in t.to_pylist():
            out[r["doc_id"]] = (r["n_spans"], r["n_kept"], r["text_clean"])
    return out


@settings(max_examples=80, deadline=None)
@given(texts=docs_strategy,
       k=st.integers(min_value=1, max_value=4),
       min_docs=st.integers(min_value=1, max_value=4))
def test_line_dedup_kernels_match_bruteforce(texts, k, min_docs):
    rows = list(enumerate(texts))
    assert _run_kernels(rows, k, min_docs) == _brute(rows, k, min_docs)
