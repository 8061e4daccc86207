"""End-to-end lazy pipelines mirroring the reference's two jobs (SURVEY.md §3).

Each pipeline is a single DataFrame plan — Catalyst sees the whole job and
can push filters into scans, prune columns, and pick join strategies across
what the reference materialized as eager intermediate frames.
"""

from big_data_project_datapipeline_spark.plans.ingest import merge_all_sources, daily_ingest
from big_data_project_datapipeline_spark.plans.features import engineer_features, incremental_feature_run

__all__ = [
    "merge_all_sources",
    "daily_ingest",
    "engineer_features",
    "incremental_feature_run",
]
