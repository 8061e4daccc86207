"""Column-level functions.

- ``temporal``   X1–X9: calendar + cyclical features (weekday trap handled).
- ``interact``   X10–X14: interaction, clipped-demand, epsilon-divide, log1p.
- ``text``       LLM-pipeline text analysis: tokenize, stats, lang-id,
                 quality score, fingerprints.
- ``dedup``      exact/minhash/simhash/jaccard dedup primitives.
- ``similarity`` vector similarity (cosine) for embedding columns.

Everything here returns Column expressions or DataFrame transforms built
from ``pyspark.sql.functions`` only — JVM-side, codegen-friendly. No Python
UDFs exist in this package (SURVEY.md §2.12).
"""

from big_data_project_datapipeline_spark.functions.temporal import (
    add_temporal_features,
    add_cyclical_features,
)
from big_data_project_datapipeline_spark.functions.interact import (
    add_interaction_features,
    add_log_transforms,
)

__all__ = [
    "add_temporal_features",
    "add_cyclical_features",
    "add_interaction_features",
    "add_log_transforms",
]
