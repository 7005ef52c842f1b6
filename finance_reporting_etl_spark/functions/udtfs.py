"""Python UDTF surface (SURVEY §2.9 — UDF/UDAF/UDTF).

A lateral table function is the row-to-rows shape (`posexplode`,
`inline`, dbt-style "flatten" macros) expressed as user code. Spark 4's
Python UDTFs fill the rare gap where the expansion logic genuinely
can't be an array expression; everything else in this repo uses
built-in generators (explode/sequence/slice), which stay in
whole-stage codegen and are the fast path. This module exists to cover
the API surface with a correct, tested example and to document the
trade-off — it is deliberately NOT used by any catalog query.

``useArrow=True`` batches rows over Arrow like a pandas UDF;
row-at-a-time UDTFs share the per-row pickle tax of classic Python
UDFs and are banned from catalog plans either way (the oracle test
greps plans for BatchEvalPython*).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk_text: string", useArrow=True)
class ChunkTextUDTF:
    """Split whitespace-tokenized text into fixed-size token chunks —
    the same contract as ``operators.corpus.chunk_documents`` (stride =
    size, no overlap, trailing partial chunk kept), reimplemented as a
    table function: one input row -> ceil(n_tokens / size) output rows.

    Column-expression twin (the production path)::

        select(explode(sequence(0, (size(toks)+size-1) div size - 1)).alias("g"),
               array_join(slice(toks, g*size+1, size), " "))
    """

    def eval(self, text: str, size: int):  # noqa: A002 - Spark's UDTF contract
        if text is None:
            return
        toks = text.strip().split()
        if not toks:
            yield 0, ""
            return
        for g in range(0, (len(toks) + size - 1) // size):
            yield g, " ".join(toks[g * size : (g + 1) * size])
