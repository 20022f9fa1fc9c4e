"""Heavy hitters over an unbounded token domain: exact top-k token
counts, plus a mergeable Count-Min sketch for when the exact count
table itself is too large to shuffle.

Exact path shape (the default — exact at any corpus size whose
*distinct-token* table fits the cluster, which is the realistic case:
vocabulary grows ~O(corpus^0.5) by Heaps' law):

1. unnest tokens + in-block Arrow ``group_by`` count — one combiner
   per block, so the shuffle moves distinct-tokens-per-block rows, not
   corpus tokens;
2. :func:`~karta_ray.stages.agg.sorted_sum` over token — range
   shuffle with bounded boundary residue, no single-block combine;
3. top-k: per-block candidate prune to k rows, then one tiny global
   sort/limit with a deterministic (count desc, token asc) tiebreak.

The Count-Min path (:mod:`karta_ray.functions.sketch`) never shuffles
tokens at all: fixed ``depth x width`` uint64 partials tree-combine
like the HLL registers.

Tokenization is the repo-wide convention (single-space split, empties
dropped) = DuckDB ``unnest(string_split(text, ' ')) ... WHERE w <> ''``
so SQL oracles reproduce counts exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import sorted_sum


def tokens_of(col) -> pa.Array:
    """Flatten a string column into its non-empty space-split tokens."""
    toks = pc.list_flatten(pc.split_pattern(col, " "))
    return toks.filter(pc.not_equal(toks, ""))


def _block_counts(text_col: str):
    def partial(batch: pa.Table) -> pa.Table:
        toks = tokens_of(batch.column(text_col))
        g = (pa.table({"token": toks}).group_by(["token"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["token", "n"])
    return partial


def token_counts(ds, *, text_col: str = "text"):
    """(token, n) exact global counts; shuffle bounded by per-block
    distinct tokens."""
    parts = ds.map_batches(_block_counts(text_col),
                           batch_format="pyarrow", zero_copy_batch=True)
    return sorted_sum(parts, ["token"], ["n"])


def top_tokens(ds, k: int, *, text_col: str = "text"):
    """Exact top-k tokens by count, ties broken by token ascending.

    The global sort runs on <= k candidate rows per count block (each
    block can only contribute k winners), so the final stage is tiny
    regardless of vocabulary size.
    """
    counts = token_counts(ds, text_col=text_col)

    def prune(batch: pa.Table) -> pa.Table:
        return batch.sort_by([("n", "descending"),
                              ("token", "ascending")]).slice(0, k)

    cand = counts.map_batches(prune, batch_size=None,
                              batch_format="pyarrow")
    return cand.sort(["n", "token"], descending=[True, False]).limit(k)
