"""Driver-side pipeline DSL — SURVEY §2.11 orchestration semantics."""
