"""Extension function library (BASELINE.json north star).

LLM-data-pipeline operators over the ``documents`` and ``embeddings``
tables: text analysis, deduplication (exact + near-dup), similarity search.
All hot-path expressions are built-in Spark SQL functions (JVM, codegen'd);
Python appears only in clearly-marked Pandas-UDF variants.
"""

from . import dedup, similarity, skew, text  # noqa: F401
