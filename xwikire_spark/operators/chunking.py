"""Fixed-size document chunking with overlap — the retrieval-corpus /
context-window prep step (RAG indexing, long-document training
examples): each document becomes ceil-stepped windows of
``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens -
overlap``.

All JVM: one ``split`` per document, chunks generated with
``sequence`` + ``transform`` + ``slice`` inside whole-stage codegen
(the kg_turns pattern — no explode-then-window, no Python). Output
grows by ~n_tokens/(chunk-overlap) rows per doc; the transform runs
inside the row, so the only shuffle is whatever the caller does next.

Chunk layout contract (mirrored in the DuckDB oracle):
- chunk i covers tokens [i*step, i*step + chunk_tokens) (0-based),
  step = chunk_tokens - overlap;
- chunks start while i*step < n_tokens, so the final chunk may be
  short but every token is covered and consecutive chunks share
  exactly ``overlap`` tokens (when a full window remains);
- INTENDED consequence (ADVICE r6, kept deliberately): when
  step < n_tokens <= chunk_tokens the trailing chunk is entirely
  contained in the previous one (e.g. n=60, chunk=64, overlap=16 emits
  a second chunk covering tokens 48-59, already inside chunk 0). The
  contract is "a chunk starts at every i*step < n_tokens" — start
  positions depend only on n, never on how much the previous chunk
  covered — which keeps chunk_idx stable under document edits that
  only change the tail and matches the committed DuckDB oracle.
  Retrieval stacks that dislike duplicated tail content should dedup
  on (doc_id, chunk_text) downstream;
- empty/whitespace-only docs produce zero chunks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks:
    (*id_cols, chunk_idx, chunk_text, n_tokens). ``overlap`` must be
    smaller than ``chunk_tokens``."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / "
            f"{chunk_tokens}"
        )
    id_cols = id_cols if id_cols is not None else ["doc_id"]
    step = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(words))
    # number of chunk starts: ceil(n / step) bounded so the last start
    # is < n; 0 chunks for empty docs
    n_chunks = F.ceil(n / F.lit(step)).cast("int")
    chunks: Column = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(words, (i * step + 1).cast("int"), chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.least(
                n - i * step, F.lit(chunk_tokens)
            ).cast("int").alias("n_tokens"),
        ),
    )
    return (
        df.where(n > 0)
        .select(*id_cols, F.explode(chunks).alias("c"))
        .select(*id_cols, "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )
