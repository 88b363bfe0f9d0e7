"""Python user-defined table functions (Spark 4 UDTF API, SPARK-43798).

The reference's only Python execution is RDD ``map`` chains; the engine's
sanctioned Python crossings are Arrow-batched (Pandas UDFs, mapInPandas).
UDTFs complete that surface: a Python class whose ``eval`` yields ZERO OR
MORE rows per input row, usable from SQL via ``LATERAL`` — the
user-extensible ``explode`` (SURVEY.md §2.8). With
``spark.sql.execution.pythonUDTF.arrow.enabled`` the exchange is
Arrow-batched (``ArrowEvalPythonUDTF`` in the plan, not the banned
row-serialized ``BatchEvalPython``).

Scale note: a UDTF is still Python executing per row — the engine's rule
stands that anything expressible as JVM Column expressions (e.g.
``text.chunk_text``, the expression-level twin of ``ChunkerUDTF``) should
be; the UDTF is the extension point for logic that genuinely needs
imperative Python, and the registry entry exists to prove the API works
end-to-end with an oracle, not to recommend it for hot paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk string")
class ChunkerUDTF:
    """Fixed-grid text chunker: row (text, size) → one row per
    ``size``-char chunk, final ragged tail kept. Deterministic pure
    function of the input — which is what makes the lateral-join entry
    SQL-oracle-checkable."""

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        for i in range(0, len(text), size):
            yield (i // size, text[i:i + size])


def register_udtfs(spark) -> None:
    """Idempotent registration of the engine's UDTFs on a session."""
    spark.udtf.register("chunker", ChunkerUDTF)
