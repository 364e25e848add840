"""Plan layer: view definitions as data + the interpreter that turns one into
a lazy DataFrame (replaces the reference's hardcoded step5 routine)."""

from data_pipeline_ine_spark.plans.builder import ViewDefinition, consolidate, consolidate_joins

__all__ = ["ViewDefinition", "consolidate", "consolidate_joins"]
