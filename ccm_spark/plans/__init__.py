from ccm_spark.plans.cross_map import ccm_plan, skill_plan, convergence_plan

__all__ = ["ccm_plan", "skill_plan", "convergence_plan"]
