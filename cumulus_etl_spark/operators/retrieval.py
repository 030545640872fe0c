"""Hybrid query-by-example retrieval: BM25 ⊕ dense cosine, RRF-fused.

The repo already has both retrieval families — sparse BM25
(operators/textstats.py:bm25_topk) and dense kNN/ANN
(operators/similarity.py) — and the integer-unit reciprocal-rank fusion
that combines any two rankings (similarity.py:rrf_fuse). This module is
the composition every curation pipeline actually runs: "find documents
like THIS one", where lexical overlap and embedding proximity each catch
matches the other misses (near-verbatim copies with swapped vocabulary
vs. paraphrases with no shared terms).

Query-by-example because there is no embedding model in the loop: the
query IS a corpus document, so its text feeds BM25 and its stored vector
feeds the dense side — ids join the two tables (the documents and
embeddings tables share the id domain).

Scale shape: each side is its own top-depth retrieval (BM25 shuffles
the corpus once with a query-pruned broadcast; the dense side is
brute-force here and swaps to the IVF/LSH/PQ operators unchanged since
all emit (query_id, neighbor_id, rank)); the fusion join then touches
only |queries| × depth rows however large the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cumulus_etl_spark.operators.similarity import knn_bruteforce, rrf_fuse
from cumulus_etl_spark.operators.textstats import bm25_topk


def hybrid_more_like_this(
    docs: DataFrame,
    embs: DataFrame,
    query_ids: list,
    k: int = 5,
    depth: int = 20,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    rrf_const: int = 60,
    dense_retriever=None,
) -> DataFrame:
    """Top-k "more like this" per query document: BM25 over the query
    doc's own text, fused with cosine neighbors of its stored embedding.

    Output: (query_id, rank, neighbor_id, rank_a, rank_b, rrf_units) —
    rank_a is the BM25 rank, rank_b the dense rank, 0 where that side
    missed (rrf_fuse semantics). The query document itself is excluded
    from BOTH sides before ranking, so ranks are gap-free and the RRF
    sum is over honest per-side positions."""
    if not query_ids:
        raise ValueError("hybrid_more_like_this needs at least one query id")
    q_docs = docs.filter(F.col(doc_id_col).isin(query_ids)).select(
        F.col(doc_id_col).alias("query_id"), F.col(text_col).alias("query")
    )
    # sparse side: exclude self BEFORE the rank window so positions are
    # gap-free (the query doc would otherwise own rank 1 of its own list)
    sparse_all = bm25_topk(
        docs, q_docs, k=depth + 1, id_col=doc_id_col, text_col=text_col
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    sparse = (
        sparse_all.filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select("query_id", "neighbor_id", "rank")
    )
    q_vecs = embs.filter(F.col(vec_id_col).isin(query_ids))
    if dense_retriever is None:
        dense = knn_bruteforce(
            embs, q_vecs, k=depth, id_col=vec_id_col, vec_col=vec_col
        )
    else:
        # any retriever emitting (query_id, neighbor_id, rank) plugs in —
        # e.g. the persistent partition-pruned IVF index's search():
        # lambda qv, d: index.search(qv, k=d, n_probe=...)
        dense = dense_retriever(q_vecs, depth)
    return rrf_fuse(
        sparse, dense.select("query_id", "neighbor_id", "rank"), k=k, const=rrf_const
    )
