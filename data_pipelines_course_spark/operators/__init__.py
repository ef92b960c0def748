"""Operator library: each module registers named queries into
data_pipelines_course_spark.queries (see SURVEY.md §2 for the inventory)."""
